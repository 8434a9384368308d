"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions; each callable (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (tables region,
nation, customer, supplier, part, orders, lineitem, events, documents,
embeddings pre-registered as views over the same parquet).

The real implementations live in ``smoltable_spark/``; the registries are
assembled in ``smoltable_spark/queries_core.py`` (wide-column operators,
SURVEY §2) and ``smoltable_spark/queries_analytics.py`` (benchmarks +
dedup/similarity/text/multimodal extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from smoltable_spark.queries_core import CORE_QUERIES
from smoltable_spark.queries_analytics import ANALYTICS_QUERIES

_MERGED = {**CORE_QUERIES, **ANALYTICS_QUERIES}

#: The driver's correctness gate checks the FIRST 50 registry entries in
#: insertion order. Registry order is derived from the staleness-proof
#: ledger (ORACLE_LEDGER.json + tools/oracle_ledger.py — VERDICT r2 top
#: ask): every query whose source+oracle stamp is missing from or differs
#: from its last green oracle check is promoted to the FRONT (it MUST be
#: re-checked this round); the rest follow ordered by oldest driver-green
#: round first (read from CORRECTNESS_r*.json), so stale green rows rotate
#: back into the window over time. ``python tools/oracle_ledger.py
#: --window-check`` fails the build locally if a changed query would fall
#: outside the first-50 window.


def _ordered(merged: dict) -> dict:
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.oracle_ledger import window_order

        return {n: merged[n] for n in window_order(merged)}
    except Exception:  # ledger must never break the driver's smoke check
        return dict(merged)


_ALL = _ordered(_MERGED)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: prefix scan with column
    filter over the melted orders table (the reference's workhorse
    operator, Smoltable::scan — reference smoltable/src/table/mod.rs:630)."""
    fn, _ = _ALL["wc_scan_prefix"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: oracle for name, (_fn, oracle) in _ALL.items() if oracle is not None}
