"""Oracle type-hygiene gate (round-4 ask).

Round 3's single driver-red row (``rel_moving_window``) was not a wrong
answer: DuckDB surfaced an uncast window ``sum()`` over BIGINT as HUGEINT
(Arrow ``decimal128(38,0)``) while Spark emitted LONG, and the driver's
typed value-hasher mismatched on type alone.  Two permanent guards:

1. every registered oracle, executed by DuckDB at sf0.001, must not
   produce a HUGEINT or DECIMAL output column (Spark never emits either
   from this codebase — integer sums stay LONG, ratios are DOUBLE);
2. the local comparator (``tools/check_oracle.norm_value``) must be
   type-strict, i.e. distinguish Decimal from int/float instead of
   collapsing them, so a future offender fails locally before it ships.
"""

import os
import sys
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TYPETEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracle_items():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_emits_no_hugeint_or_decimal(con, name, sql):
    rel = con.sql(sql)
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    assert not offenders, (
        f"{name}: oracle columns {offenders} would arrive as Arrow decimal128 "
        "and hash-mismatch Spark's LONG/DOUBLE — wrap in CAST(... AS BIGINT) "
        "(or divide to DOUBLE) in the oracle SQL"
    )


def test_norm_value_is_type_strict():
    from tools.check_oracle import norm_value

    # The exact r3 failure class: equal values, different types.
    assert norm_value(Decimal(5)) != norm_value(5)
    assert norm_value(Decimal("5.0")) != norm_value(5.0)
    assert norm_value(True) != norm_value(1)
    # Equal value + equal type still matches, including nested.
    assert norm_value([1, 2.5]) == norm_value([1, 2.5])
    assert norm_value([Decimal(1)]) != norm_value([1])
    # bytes and bytearray both become Arrow binary driver-side.
    assert norm_value(b"\x01") == norm_value(bytearray(b"\x01"))
