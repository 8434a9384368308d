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
    cells: DataFrame,
    num_partitions: int | None = None,
    descending: bool = False,
    col: str = "row_key",
) -> DataFrame:
    """Return DataFrame(``col`` , rk LONG) with global 1-based rank over
    the DISTINCT values of ``col`` (descending order when ``descending``
    — backward scans). ``col`` defaults to the cell schema's row_key but
    any orderable column works — e.g. the unique interleave slot ids in
    ``pipeline_interleave_datasets``."""
    order = F.col(col).desc() if descending else F.col(col).asc()
    keys = cells.select(col).distinct()
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
        .select(col, "rk")
    )
    return out


def ranked_rows(
    df: DataFrame,
    order: list,
    rk_col: str = "rk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number()`` over an arbitrary multi-column ordering
    WITHOUT an unpartitioned window — the row-level generalization of
    :func:`ranked_row_keys` (keeps every input column, no distinct).

    ``order`` is a list of Column expressions (e.g. ``[F.col('c').desc(),
    F.col('tok').asc()]``). Rows are range-partitioned on the ordering,
    ranked by a NARROW per-partition window, and offset by collected
    per-partition counts (one row each). Ties straddling a range
    boundary are fine: ``row_number`` is tie-arbitrary by definition —
    pass a total order (include a unique tiebreaker) when determinism
    matters, as every caller here does.
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    rows = df.repartitionByRange(num_partitions, *order)
    rows = rows.withColumn("_pid", F.spark_partition_id())
    # freeze the physical partitioning (same reasoning as ranked_row_keys)
    rows = rows.localCheckpoint(eager=True)
    w = Window.partitionBy("_pid").orderBy(*order)
    rows = rows.withColumn("_rn", F.row_number().over(w))
    counts = {
        r["_pid"]: r["cnt"]
        for r in rows.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _off LONG"
    )
    return (
        rows.join(F.broadcast(off_df), "_pid")
        .withColumn(rk_col, (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def value_min_ranks(
    df: DataFrame, value_col: str, num_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """SQL ``rank()`` (ties share the MIN rank) over ALL rows of
    ``value_col``, without a single-partition window — the hierarchical
    prefix-sum decomposition (VERDICT r8 ask #1 for
    ``rel_percentile_rank``).

    ``rank(v) = 1 + #rows with value < v``, so it is a pure function of
    the per-value multiplicity histogram:

    1. ``groupBy(value) → cnt`` (map-side combine keeps the shuffle
       output one row per DISTINCT value),
    2. ``repartitionByRange(value)`` → every distinct value lands in
       exactly ONE partition (no tie can straddle a boundary, unlike
       range-partitioning the raw rows),
    3. narrow per-partition running sum of ``cnt`` in value order,
    4. per-partition totals (one row per partition, collected) →
       cumulative offsets; ``rank = offset + running - cnt + 1``.

    Returns ``(DataFrame(value_col, r LONG), n)`` with one row per
    distinct value and ``n`` = total input rows (free: the sum of the
    per-partition totals already collected) — callers join ranks back
    to their id-carrying rows on ``value_col`` and use ``n`` as the
    window-free ``count() OVER ()`` replacement.
    """
    counts = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    counts = counts.repartitionByRange(num_partitions, F.col(value_col).asc())
    counts = counts.withColumn("_pid", F.spark_partition_id())
    # freeze the physical partitioning (same reasoning as ranked_row_keys)
    counts = counts.localCheckpoint(eager=True)
    w = Window.partitionBy("_pid").orderBy(F.col(value_col).asc())
    counts = counts.withColumn("_run", F.sum("_cnt").over(w))
    totals = {
        r["_pid"]: r["t"]
        for r in counts.groupBy("_pid").agg(F.sum("_cnt").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _off LONG"
    )
    ranks = (
        counts.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "r",
            (F.col("_off") + F.col("_run") - F.col("_cnt") + 1).cast("long"),
        )
        .select(value_col, "r")
    )
    return ranks, acc


def grouped_ranked_values(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group global rank of ``value_col`` WITHOUT per-group single
    partitions — the grouped generalization of :func:`ranked_row_keys`.

    ``row_number().over(Window.partitionBy(group).orderBy(value))`` puts
    each group in ONE partition: fine for many small groups, a
    straggler-maker when a handful of groups hold 100 TB between them
    (e.g. exact quantiles per event_type). Instead:

    1. ``repartitionByRange(group, value)`` → each group spans a *run* of
       globally ordered partitions (a big group gets many),
    2. narrow per-(partition, group) ``row_number`` (no extra shuffle),
    3. per-(partition, group) counts — one row per (pid, group), tiny —
       collected and turned into per-group cumulative offsets,
    4. global in-group rank = local rank + offset, via a broadcast join.

    Rows are NOT deduplicated: ties keep their multiplicity, so the value
    at in-group rank k is deterministic even though tie order is not.
    Returns DataFrame(group_col, value_col, rk LONG) with rk = 1..n_group.
    """
    rows = df.select(group_col, value_col)
    if num_partitions is None:
        num_partitions = max(rows.sparkSession.sparkContext.defaultParallelism, 8)
    rows = rows.repartitionByRange(
        num_partitions, F.col(group_col).asc(), F.col(value_col).asc()
    )
    rows = rows.withColumn("_pid", F.spark_partition_id())
    # freeze the physical partitioning (same reasoning as ranked_row_keys):
    # offsets below are only valid for THIS materialization.
    rows = rows.localCheckpoint(eager=True)
    w = Window.partitionBy("_pid", group_col).orderBy(F.col(value_col).asc())
    rows = rows.withColumn("_rn", F.row_number().over(w))
    counts = (
        rows.groupBy("_pid", group_col)
        .agg(F.count("*").alias("cnt"))
        .collect()
    )  # one row per (partition, group) — bounded by partitions × groups
    by_group: dict = {}
    for r in counts:
        by_group.setdefault(r[group_col], []).append((r["_pid"], r["cnt"]))
    off_rows = []
    for g, lst in by_group.items():
        acc = 0
        for pid, cnt in sorted(lst):
            off_rows.append((pid, g, acc))
            acc += cnt
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType.simpleString()
    off_df = spark.createDataFrame(
        off_rows, f"_pid INT, {group_col} {gtype}, _off LONG"
    )
    return (
        rows.join(F.broadcast(off_df), ["_pid", group_col])
        .withColumn("rk", (F.col("_rn") + F.col("_off")).cast("long"))
        .select(group_col, value_col, "rk")
    )


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
