"""PaddedIntKeyCodec — row-key-predicate → numeric-bounds transposition.

Bounds must be SUPERSETS of the matching key set (the residual string
filter restores exactness); tests assert both tightness on clean inputs
and superset-correctness on messy ones.
"""

from smoltable_spark.api import RowRange, ScanInput
from smoltable_spark.sources.relational import ORDERS_KEY_CODEC as C
from smoltable_spark.sources.relational import scan_key_bounds


def encode(k: int, suffix: str = "") -> str:
    return f"order#{k:012d}{suffix}"


def matches_prefix(k, p):
    return encode(k).startswith(p) or encode(k, "#01").startswith(p)


def test_prefix_full_scan():
    assert C.prefix_bounds("") is None
    assert C.prefix_bounds("order") is None
    assert C.prefix_bounds("order#") is None


def test_prefix_mismatch_is_empty():
    lo, hi = C.prefix_bounds("zorder#")
    assert lo > hi
    lo, hi = C.prefix_bounds("order#x")
    assert lo > hi


def test_prefix_digit_run():
    assert C.prefix_bounds("order#00000000012") == (120, 129)
    assert C.prefix_bounds("order#000000000120") == (120, 120)


def test_prefix_with_suffix_chars():
    # lineitem-style key: full 12 digits then '#01' — exact key bound
    assert C.prefix_bounds("order#000000000120#0") == (120, 120)


def test_range_bounds_superset():
    lo, hi = C.range_bounds("order#000000000100", "order#000000000200")
    assert lo <= 100 and hi >= 200
    # every key in [100, 200] is inside the bounds
    assert all(lo <= k <= hi for k in (100, 150, 200))


def test_range_bounds_below_and_above_keyspace():
    lo, hi = C.range_bounds("a", "zzz")  # string range covering everything
    assert lo == 0 and hi == C._max_key()


def test_scan_key_bounds_dispatch():
    assert scan_key_bounds(C, ScanInput(prefix="order#00000000012")) == (120, 129)
    b = scan_key_bounds(
        C,
        ScanInput(
            ranges=(
                RowRange("order#000000000100", "order#000000000110", True),
                RowRange("order#000000000500", "order#000000000510", True),
            )
        ),
    )
    assert b[0] <= 100 and b[1] >= 510
    assert scan_key_bounds(C, ScanInput(prefix="")) is None


def test_superset_property_exhaustive_small():
    """Brute-force check: for every key 0..999 and a set of predicates,
    bounds never exclude a matching key."""
    prefixes = ["order#0000000001", "order#00000000005", "order#000000000042"]
    for p in prefixes:
        b = C.prefix_bounds(p)
        for k in range(1000):
            if encode(k).startswith(p):
                assert b is None or (b[0] <= k <= b[1]), (p, k, b)
    ranges = [
        ("order#000000000010", "order#000000000020"),
        ("order#00000000001", "order#0000000000305"),
        ("order#000000000000", "order#000000000999"),
    ]
    for s, e in ranges:
        lo, hi = C.range_bounds(s, e)
        for k in range(1000):
            if s <= encode(k) <= e:
                assert lo <= k <= hi, (s, e, k, lo, hi)


# -- hypothesis: superset property over arbitrary predicate strings --------

from hypothesis import given, settings, strategies as st

key_chars = st.text(alphabet="01259az#o", max_size=22)
keys = st.integers(min_value=0, max_value=2000)


@settings(max_examples=300, deadline=None)
@given(p=st.one_of(key_chars, key_chars.map(lambda s: "order#" + s)))
def test_prefix_bounds_superset_property(p):
    b = C.prefix_bounds(p)
    for k in range(0, 2001, 7):
        for suffix in ("", "#03"):
            if encode(k, suffix).startswith(p):
                assert b is None or (b[0] <= k <= b[1]), (p, k, b)


@settings(max_examples=300, deadline=None)
@given(
    s=st.one_of(key_chars, key_chars.map(lambda x: "order#" + x)),
    e=st.one_of(key_chars, key_chars.map(lambda x: "order#" + x)),
)
def test_range_bounds_superset_property(s, e):
    lo, hi = C.range_bounds(s, e)
    for k in range(0, 2001, 7):
        for suffix in ("", "#03"):
            rk = encode(k, suffix)
            if s <= rk <= e:
                assert lo <= k <= hi, (s, e, k, lo, hi)
