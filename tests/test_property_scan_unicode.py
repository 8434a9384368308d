"""Unicode row-key differential: scan_cells vs the pure-Python model.

The batch property suite (test_property_scan.py) drives ASCII keys only,
but the scan contract — prefix, inclusive/exclusive range, reverse — is
defined by STRING ORDER, so it silently depends on Spark's default
collation agreeing with the Python model's code-point comparisons.
Spark 4's UTF8_BINARY default does agree (UTF-8 byte order ≡ code-point
order, including astral chars, where UTF-16 code-unit order would NOT:
U+1F600's surrogates sort below U+FFFF). These tests pin that agreement
so a session-level collation change (spark.sql.collation.default or a
COLLATE-tagged schema) cannot silently flip range semantics between the
engine and its DuckDB oracles.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from smoltable_spark.api import RowRange, ScanInput
from smoltable_spark.operators.scan import scan_cells
from tests.conftest import make_cells
from tests.test_property_scan import model_scan

# ASCII mixed with Latin-1, Greek, a combining sequence, U+FFFF, and
# astral (surrogate-paired) emoji — the characters where code-point,
# UTF-8-byte, and UTF-16-code-unit orders are most likely to disagree.
U_ROW_KEYS = ["ab", "a\U0001f600", "é", "éz", "ÿ", "́e", "α", "αβ",
              "￿", "\U0001f600", "\U0001f600a"]
U_PREFIXES = ["", "a", "é", "α", "\U0001f600", "￿"]
_SORTED = sorted(U_ROW_KEYS)

u_cells = st.lists(
    st.tuples(
        st.sampled_from(U_ROW_KEYS),
        st.sampled_from(["f", "g"]),
        st.sampled_from(["", "q1"]),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=18,
    unique=True,
)

u_inputs = st.builds(
    ScanInput,
    prefix=st.one_of(st.none(), st.sampled_from(U_PREFIXES)),
    range=st.one_of(
        st.none(),
        st.builds(
            RowRange,
            start=st.sampled_from(_SORTED[:6]),
            end=st.sampled_from(_SORTED[4:]),
            inclusive=st.booleans(),
        ),
    ),
    row_limit=st.one_of(st.none(), st.integers(1, 4)),
    row_offset=st.integers(0, 2),
    reverse=st.booleans(),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(cells=u_cells, inp=u_inputs)
def test_unicode_scan_matches_model(spark, cells, inp):
    rows = [(rk, fam, q, ts, "string", f"v{ts}") for rk, fam, q, ts in cells]
    df = make_cells(spark, rows)
    got = {
        (r.row_key, r.family, r.qualifier, r.ts)
        for r in scan_cells(df, inp).collect()
    }
    assert got == model_scan(cells, inp)


def test_spark_string_order_is_code_point_order(spark):
    """The collation canary: Spark's ORDER BY over these keys must equal
    Python's sorted() (code-point order). If this ever fails, the scan
    range/reverse semantics and every oracle comparison sorted in Python
    or DuckDB diverge — fix the session collation, don't relax this."""
    df = spark.createDataFrame([(k,) for k in U_ROW_KEYS], "row_key string")
    assert [r.row_key for r in df.orderBy("row_key").collect()] == _SORTED
