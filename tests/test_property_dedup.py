"""Differential property tests for the banded SimHash near-dup search.

Hypothesis drives arbitrary 60-bit signature sets (base values plus
near-dup derivatives within a few bit flips); the banded Spark plan must
return exactly the brute-force all-pairs Hamming answer — the pigeonhole
exhaustiveness claim (max_distance < bands) checked against adversarial
bit patterns, not just the docs fixture.
"""

from itertools import combinations

from hypothesis import HealthCheck, given, settings, strategies as st

from smoltable_spark.functions import dedup

BITS, BANDS, MAXD = 60, 4, 3


@st.composite
def signature_sets(draw):
    base = draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << BITS) - 1),
            min_size=1,
            max_size=6,
            unique=True,
        )
    )
    sigs = list(base)
    # derivatives: flip 0..5 bits of a base value so Hamming-close pairs
    # (including exact dups) actually occur — uniform random 60-bit values
    # are essentially never within distance 3 of each other
    n_derived = draw(st.integers(min_value=0, max_value=8))
    for _ in range(n_derived):
        src = draw(st.sampled_from(base))
        flips = draw(
            st.lists(
                st.integers(min_value=0, max_value=BITS - 1),
                min_size=0,
                max_size=5,
                unique=True,
            )
        )
        for b in flips:
            src ^= 1 << b
        sigs.append(src)
    return list(enumerate(sigs))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(sig_rows=signature_sets())
def test_banded_simhash_equals_bruteforce(spark, sig_rows):
    want = {
        (a, b): bin(sa ^ sb).count("1")
        for (a, sa), (b, sb) in combinations(sig_rows, 2)
        if bin(sa ^ sb).count("1") <= MAXD
    }
    sigs_df = spark.createDataFrame(sig_rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_duplicates(
            None, bits=BITS, bands=BANDS, max_distance=MAXD, sigs=sigs_df
        ).collect()
    }
    assert got == want
