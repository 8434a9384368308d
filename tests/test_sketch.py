"""Misra-Gries heavy-hitter sketch: superset guarantee + exactness.

The registry query (txt_heavy_hitters) is oracle-pinned against the naive
GROUP BY/HAVING; these tests pin the part the oracle can't see — that the
MG candidate pruning NEVER drops a true heavy hitter, for any stream and
any partitioning (the pigeonhole argument in functions/sketch.py).
"""

import math
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from smoltable_spark.functions import sketch


def _mg_summary(stream, k):
    counters = {}
    for tok in stream:
        sketch._mg_add(counters, tok, 1, k)
    return counters


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=20),
)
@settings(max_examples=300, deadline=None)
def test_mg_single_stream_superset(stream, k):
    counters = _mg_summary(stream, k)
    assert len(counters) <= k
    n = len(stream)
    for tok, c in Counter(stream).items():
        if c > n / (k + 1):
            assert tok in counters, (tok, c, n, k)


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.floats(min_value=0.05, max_value=0.5),
    st.lists(st.integers(min_value=0, max_value=400), max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_mg_partitioned_superset(stream, theta, cut_points):
    """θ-heavy items survive the UNION of per-partition summaries for any
    partitioning of the stream — the distributed phase-1 invariant."""
    k = math.ceil(1 / theta)
    n = len(stream)
    cuts = sorted({min(c, n) for c in cut_points})
    parts, lo = [], 0
    for c in cuts + [n]:
        if c > lo:
            parts.append(stream[lo:c])
            lo = c
    union = set()
    for p in parts:
        union |= set(_mg_summary(p, k))
    for tok, c in Counter(stream).items():
        if c >= theta * n:
            assert tok in union, (tok, c, theta, n, [len(p) for p in parts])


def test_weighted_add_matches_unit_adds():
    """Folding (tok, c) in one weighted step keeps the same bound as c
    unit steps: counters undercount true frequency by at most n/(k+1)."""
    stream = [1] * 40 + [2] * 30 + list(range(3, 40))
    k = 5
    counters = {}
    for tok, c in Counter(stream).items():
        sketch._mg_add(counters, tok, c, k)
    n = len(stream)
    for tok, c in Counter(stream).items():
        assert counters.get(tok, 0) >= c - n / (k + 1) - 1e-9


def test_heavy_hitters_validates_params(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        sketch.heavy_hitters(df, threshold=0.0)
    with pytest.raises(ValueError):
        sketch.heavy_hitters(df, threshold=0.1, k=3)


def test_heavy_hitters_exact_vs_bruteforce(spark):
    import pyspark.sql.functions as F

    rows = [("x",)] * 50 + [("y",)] * 20 + [(f"t{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "tok string").repartition(4)
    got = {
        (r["tok"], r["cnt"])
        for r in sketch.heavy_hitters(df, threshold=0.15).collect()
    }
    n = len(rows)
    brute = {
        (r["tok"], r["cnt"])
        for r in df.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= math.ceil(0.15 * n))
        .collect()
    }
    assert got == brute == {("x", 50), ("y", 20)}


def test_hll_distinct_accuracy_both_ranges(spark):
    """Small-range groups hit the literal-table linear-counting branch
    (near-exact); larger groups the raw estimate (±~10% at m=256)."""
    rows = [("small", f"u{i}") for i in range(40)]
    rows += [("big", f"v{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, uid string").repartition(6)
    got = {r["g"]: r["approx_distinct"] for r in
           sketch.hll_distinct(df, "g", "uid").collect()}
    # m=256 → std error ≈ 6.5%; this seed draws ~+11% on the big group
    assert abs(got["small"] - 40) / 40 < 0.05, got
    assert abs(got["big"] - 3000) / 3000 < 0.15, got


@given(
    st.lists(st.sampled_from([f"t{i}" for i in range(40)]), min_size=1, max_size=300),
    st.lists(st.sampled_from([f"t{i}" for i in range(50)]), min_size=1, max_size=8, unique=True),
)
@settings(max_examples=10, deadline=None)
def _cm_never_undercounts(sp_stream, probes):
    """CM property: est >= exact for every probe, with the εN overcount
    bound (ε = e/width, here vanishingly small)."""
    spark = _cm_never_undercounts._spark
    df = spark.createDataFrame([(t,) for t in sp_stream], "tok string").repartition(3)
    sk = sketch.cm_sketch(df)
    est = {r["tok"]: r["est"] for r in sketch.cm_estimate(sk, list(probes)).collect()}
    exact = Counter(sp_stream)
    for p in probes:
        assert est[p] >= exact.get(p, 0)
        assert est[p] <= exact.get(p, 0) + len(sp_stream)  # trivial upper sanity


def test_cm_never_undercounts(spark):
    _cm_never_undercounts._spark = spark
    _cm_never_undercounts()


def test_heavy_hitters_null_tokens_excluded_from_n(spark):
    """N must count NON-NULL tokens only (round-3 advice): value_counts
    drops None in the MG phase and the left_semi join never matches NULL,
    so a null-heavy stream must not inflate the ceil(θ·N) cutoff."""
    import pyspark.sql.functions as F

    # 40 non-null tokens (x:20, y:12, t0..t7:1 each) + 60 NULLs.
    rows = [("x",)] * 20 + [("y",)] * 12 + [(f"t{i}",) for i in range(8)]
    rows += [(None,)] * 60
    df = spark.createDataFrame(rows, "tok string").repartition(4)
    got = {
        (r["tok"], r["cnt"])
        for r in sketch.heavy_hitters(df, threshold=0.3).collect()
    }
    # over non-null N=40: cutoff 12 -> {x, y}. With the old bug N=100
    # gave cutoff 30 -> {} (y, then x, silently dropped).
    brute_n = df.filter(F.col("tok").isNotNull()).count()
    assert brute_n == 40
    assert got == {("x", 20), ("y", 12)}
