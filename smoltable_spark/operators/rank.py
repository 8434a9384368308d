"""Distributed global ranking of row keys.

Row-level limit/offset/stride-sample semantics (SURVEY §2.4 Q1a/b/f) are
defined over the *global row-key order*. A naive
``dense_rank().over(Window.orderBy('row_key'))`` collapses to a single
partition — fine at test scale, a driver-killer at 100 TB. Instead:

1. distinct row keys (map-side combine keeps the shuffle small),
2. ``repartitionByRange`` on row_key → globally ordered partition ranges,
3. per-partition ``row_number`` over a window keyed by the physical
   partition id (narrow — no extra shuffle),
4. per-partition counts → cumulative offsets (tiny driver-side list,
   one row per partition) → global rank = local rank + partition offset.

The result is a ``(row_key, rk)`` DataFrame with rk = 1..N in row-key
order, computed with one shuffle and no single-partition stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ranked_row_keys(
    cells: DataFrame, num_partitions: int | None = None, descending: bool = False
) -> DataFrame:
    """Return DataFrame(row_key STRING, rk LONG) with global 1-based rank
    (in descending key order when ``descending`` — backward scans)."""
    order = F.col("row_key").desc() if descending else F.col("row_key").asc()
    keys = cells.select("row_key").distinct()
    if num_partitions is None:
        num_partitions = max(keys.sparkSession.sparkContext.defaultParallelism, 8)
    keys = keys.repartitionByRange(num_partitions, order)
    keys = keys.withColumn("_pid", F.spark_partition_id())
    # freeze the physical partitioning: the offsets computed below are only
    # valid for THIS materialization — without the checkpoint, the final
    # join re-executes the lineage and AQE may coalesce differently,
    # shifting partition ids and corrupting ranks.
    keys = keys.localCheckpoint(eager=True)
    w = Window.partitionBy("_pid").orderBy(order)
    keys = keys.withColumn("_rn", F.row_number().over(w))
    # per-partition counts: tiny (one row per partition) → safe to collect
    counts = {
        r["_pid"]: r["cnt"]
        for r in keys.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = cells.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _off LONG"
    )
    out = (
        keys.join(F.broadcast(off_df), "_pid")
        .withColumn("rk", (F.col("_rn") + F.col("_off")).cast("long"))
        .select("row_key", "rk")
    )
    return out


def top_row_keys(cells: DataFrame, n: int, descending: bool = False) -> DataFrame:
    """First ``n`` distinct row keys in row-key order, with rank.

    Fast path for limit/offset when n is bounded (the reference caps at
    u16::MAX): ``orderBy().limit()`` compiles to TakeOrderedAndProject — a
    distributed top-k with no global sort — and the tiny result is ranked
    with a driver-local window.
    """
    order = F.col("row_key").desc() if descending else F.col("row_key").asc()
    keys = cells.select("row_key").distinct().orderBy(order).limit(n)
    w = Window.orderBy(order)  # bounded by n — single partition is fine
    return keys.withColumn("rk", F.row_number().over(w).cast("long"))
