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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from smoltable_spark.queries_core import CORE_QUERIES
from smoltable_spark.queries_analytics import ANALYTICS_QUERIES

_ALL = {**CORE_QUERIES, **ANALYTICS_QUERIES}


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
