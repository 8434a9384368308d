"""Garbage collection: version limits (D2) and TTL (D3).

Reference ``run_version_gc`` smoltable/src/table/mod.rs:455-562:
  - version GC (mod.rs:536-543): for families with ``version_limit: N``,
    drop versions beyond the N newest per (row, family, qualifier);
  - TTL GC (mod.rs:545-557): for families with ``ttl_secs: T``, drop cells
    older than T seconds — cells with ts == 0 are exempt (mod.rs:546);
  - short-circuit when no family defines retention (mod.rs:466-473).

GC is a periodic batch rewrite job (the reference runs it every 24h,
server/src/worker/gc.rs:6-41). Set-oriented translation: one window rank
per family-with-version-limit, one timestamp predicate per family-with-TTL
— all in a single pass over the cells table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from smoltable_spark.api import ColumnFamilyDef


def run_version_gc(cells: DataFrame, families: list[ColumnFamilyDef]) -> DataFrame:
    """Keep only the newest ``version_limit`` versions per column."""
    limits = {f.name: f.version_limit for f in families if f.version_limit}
    if not limits:
        return cells  # GC short-circuit (mod.rs:466-473)
    w = Window.partitionBy("row_key", "family", "qualifier").orderBy(F.col("ts").desc())
    limit_expr = F.coalesce(
        *[
            F.when(F.col("family") == F.lit(fam), F.lit(n))
            for fam, n in limits.items()
        ],
        F.lit(None).cast("int"),
    )
    return (
        cells.withColumn("_limit", limit_expr)
        .withColumn("_vr", F.row_number().over(w))
        .filter(F.col("_limit").isNull() | (F.col("_vr") <= F.col("_limit")))
        .drop("_limit", "_vr")
    )


def run_ttl_gc(
    cells: DataFrame, families: list[ColumnFamilyDef], now_nanos: int
) -> DataFrame:
    """Drop cells older than their family's TTL; ts==0 cells are exempt."""
    ttls = {f.name: f.ttl_secs for f in families if f.ttl_secs}
    if not ttls:
        return cells
    keep = F.lit(True)
    for fam, ttl in ttls.items():
        cutoff = now_nanos - ttl * 1_000_000_000
        keep = keep & (
            (F.col("family") != F.lit(fam))
            | (F.col("ts") == 0)  # TTL-exempt (mod.rs:546)
            | (F.col("ts") >= F.lit(cutoff))
        )
    return cells.filter(keep)


def run_gc(
    cells: DataFrame, families: list[ColumnFamilyDef], now_nanos: int
) -> DataFrame:
    """Full GC pass: version limits then TTL (single job, two predicates)."""
    return run_ttl_gc(run_version_gc(cells, families), families, now_nanos)
