"""Time-series joins and sessionization for event streams.

The reference's only time-series surface is its metrics tables (append-only
f64 points read back per series, server/src/metrics.rs:39-45); these
operators extend that into the joins a training-data / analytics pipeline
actually needs over event streams at scale.

Scale design notes (100 TB):

- ``asof_join`` uses the union + last-non-null-carry-forward pattern:
  ONE shuffle of each side on the join key (the window partition), no row
  explosion, no range cross-product. This is how you as-of join two
  petabyte streams — a naive ``t1.ts >= t2.ts`` theta-join is a
  per-key cross product that dies at scale, and Spark has no native
  ASOF JOIN operator to fall back on.
- A pathologically hot key serializes into one task (window partition).
  For known-skewed keys, pre-split the right side by time range and
  union the per-range as-of results (the carry-forward value at a range
  boundary seeds the next range) — not needed for the driver datasets.
- ``sessionize`` is the classic lag + cumulative-sum-of-boundaries window
  pipeline: one shuffle on the entity key, linear within partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` within the same ``on`` key (backward
    as-of, inclusive). Left rows with no prior right row keep nulls.

    Right-side times should be unique per key for deterministic results
    (ties would make "the" latest row ambiguous in any engine).

    Implementation: tag sides, align schemas with nulls, union, then one
    ``last(..., ignorenulls=True)`` running window per right column over
    ``(key) ORDER BY (time, side)`` — right rows sort before left rows at
    equal time, making the match inclusive. Filter back to left rows.
    """
    if right_cols is None:
        # include right_time by default: "which row matched" is part of the answer
        right_cols = [c for c in right.columns if c != on]

    left_payload = [c for c in left.columns if c not in (on, left_time)]

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    combined = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        combined = combined.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))

    return combined.filter(F.col("_side") == 1).select(
        F.col("_k").alias(on),
        F.col("_t").alias(left_time),
        *[F.col(c) for c in left_payload],
        *[F.col(f"_r_{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_start: str,
    right_end: str,
    bucket: int,
) -> DataFrame:
    """Interval join: left rows matched to right rows with
    ``right_start <= left_time <= right_end`` within the same key.

    Scale path: both sides are bucketed by ``time div bucket`` and joined
    on ``(key, bucket_id)`` — an equi-join Spark executes as a shuffled
    hash/sort-merge join — then the exact interval predicate filters
    within buckets. A right interval spans ``ceil(len/bucket)+1`` buckets
    (exploded via ``sequence``), so choose ``bucket`` ≥ the typical
    interval length: candidate blow-up stays ~2× and the per-key cross
    product of a naive theta-join never forms.
    """
    lb = left.withColumn("_b", (F.col(left_time) / bucket).cast("long"))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (F.col(right_start) / bucket).cast("long"),
                (F.col(right_end) / bucket).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, on=[on, "_b"], how="inner")
        .filter(
            (F.col(left_time) >= F.col(right_start))
            & (F.col(left_time) <= F.col(right_end))
        )
        .drop("_b")
    )


def sessionize(
    events: DataFrame,
    key: str,
    time_col: str,
    gap: int,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same ``key`` exceeds ``gap`` (same
    unit as ``time_col``). Adds ``session_id`` (1-based per key).

    lag → boundary flag → running sum: both window steps share one
    shuffle on ``key``.
    """
    w = Window.partitionBy(key).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    boundary = F.when(prev.isNull() | (F.col(time_col) - prev > gap), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def resample_ffill(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    step: int,
) -> DataFrame:
    """Resample an irregular series onto a fixed ``step`` grid and
    forward-fill buckets with no observations (gap fill) — the classic
    timeseries densification Spark has no native operator for.

    Returns one row per (key, bucket) from each key's first to last
    observed bucket: ``bucket``, ``value_ffill`` (last observed value
    at-or-before the bucket), ``n_obs`` (observations inside the bucket,
    0 for filled gaps).

    Scale design (100 TB): the raw stream is touched exactly once, by a
    partially-aggregated groupBy (map-side combine) that compresses it to
    ≤ one row per (key, bucket). Every window below runs over that
    RESAMPLED grid — |grid| = span/step per key, independent of raw
    event volume — so the per-key window partitions stay small no matter
    how hot a key is. In-bucket "last" is the max of ``struct(time,
    value)``: a total order, so ties on time resolve deterministically by
    value in any engine.
    """
    # integer div, NOT `/` + cast: epoch-nanos exceed double's 2^53 exact
    # integer range, so float division would misplace bucket boundaries
    b = F.expr(f"{time_col} div {step}")
    obs = (
        df.groupBy(F.col(key).alias("_k"), b.alias("bucket"))
        .agg(
            F.max(F.struct(F.col(time_col), F.col(value_col).alias("_v")))["_v"].alias(
                "_last_obs"
            ),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    bounds = obs.groupBy("_k").agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    grid = bounds.select(
        "_k", F.explode(F.sequence("_mn", "_mx")).alias("bucket")
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["_k", "bucket"], "left")
        .select(
            F.col("_k").alias(key),
            "bucket",
            F.last("_last_obs", ignorenulls=True).over(w).alias("value_ffill"),
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
    )


def session_stats(
    events: DataFrame,
    key: str,
    time_col: str,
    gap: int,
) -> DataFrame:
    """Per-session aggregate: event count, start/end time, duration."""
    s = sessionize(events, key, time_col, gap)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        (F.max(time_col) - F.min(time_col)).alias("duration"),
    )
