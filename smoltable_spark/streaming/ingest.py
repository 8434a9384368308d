"""Structured Streaming extension.

The reference has NO streaming operators — its workers are periodic batch
loops (SURVEY §2.9/§2.11). This module is the forward-looking extension
the north star asks for: the same cell/rollup semantics expressed as
incremental streams, so a 100 TB pipeline can keep its metrics tables and
rollups continuously fresh instead of re-scanning.

Pieces:
- ``stream_events``: file-source stream over the events schema (new
  parquet files appearing in a directory are the micro-batches);
- ``events_to_cells_stream``: the F7/F8 melt as a streaming projection —
  identical expressions to the batch melt (one code path, two runtimes);
- ``hourly_rollup_stream``: watermarked tumbling-window aggregation —
  late events beyond the watermark are dropped deterministically;
- ``running_stats_stream``: custom stateful operator via
  ``applyInPandasWithState`` keeping per-series running count/sum/max —
  the pattern for operators Spark's built-ins can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from smoltable_spark.sources.relational import _EVENTS_SCHEMA

_HOUR_NS = 3_600_000_000_000


def stream_events(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    glob: str = "*.parquet",
) -> DataFrame:
    """File-source stream of events (raw-nanos LongType ts, like batch).

    Streaming needs a declared schema; infer it from the files already on
    disk (one driver-side footer read) so the stream accepts both on-disk
    ``ts`` encodings the driver has shipped (raw INT64 nanos, TIMESTAMP),
    then normalize to the engine's raw-nanos contract exactly like batch
    ``load_table`` (sources/relational.py::normalize_event_ts).
    """
    from smoltable_spark.sources.relational import normalize_event_ts

    try:
        src_schema = (
            spark.read.option("pathGlobFilter", glob).parquet(path).schema
        )
    except Exception:  # empty dir at stream start — fixtures use raw nanos
        src_schema = _EVENTS_SCHEMA
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )
    return normalize_event_ts(stream)


def events_to_cells_stream(events: DataFrame) -> DataFrame:
    """Streaming melt to canonical cells — same expressions as the batch
    melt (sources/relational.py::events_cells); narrow, no state."""
    return events.select(
        F.concat(
            F.col("event_type"),
            F.lit("#user#"),
            F.lpad(F.col("user_id").cast("string"), 6, "0"),
        ).alias("row_key"),
        F.lit("value").alias("family"),
        F.lit("").alias("qualifier"),
        F.expr("(ts div 1000) * 1000").alias("ts"),
        F.lit("f64").alias("vtype"),
        F.lit(None).cast("string").alias("v_str"),
        F.lit(None).cast("boolean").alias("v_bool"),
        F.lit(None).cast("short").alias("v_byte"),
        F.lit(None).cast("int").alias("v_i32"),
        F.lit(None).cast("long").alias("v_i64"),
        F.lit(None).cast("float").alias("v_f32"),
        F.col("value").cast("double").alias("v_f64"),
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup (event-time, late data dropped).

    Mirrors the batch ``rel_events_hourly`` semantics; the raw-nanos long
    is converted to a TimestampType event-time column for the watermark,
    while the emitted bucket stays exact integer nanos-div-hour.
    """
    with_time = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", "1 hour").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            "event_type",
            (F.unix_micros(F.col("win.start")) * 1000).cast("long").alias("bucket_start_ns"),
            "n_events",
            "total_value",
        )
    )


def ohlc_bars_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked streaming OHLC bars — the streaming face of the batch
    ``rel_ohlc_bars`` aggregate, and the same trick: open/close are
    min/max over struct(ts, event_id, cents), which is an ordinary
    commutative aggregate the streaming state store can hold partially
    (one struct per open window), unlike a windowed row_number which
    streaming cannot express at all. Bars finalize when the watermark
    passes the hour boundary; all values exact cents."""
    with_time = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    c = F.round(F.col("value") * 100).cast("long")
    key = F.struct(F.col("ts").alias("t"), F.col("event_id").alias("id"), c.alias("c"))
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(key).getField("c").alias("open_cents"),
            F.max(c).alias("high_cents"),
            F.min(c).alias("low_cents"),
            F.max(key).getField("c").alias("close_cents"),
        )
        .select(
            "event_type",
            F.expr("unix_micros(win.start) * 1000 div 3600000000000")
            .cast("long")
            .alias("bucket"),
            "n",
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id: duplicates arriving within the
    watermark horizon are dropped; state for ids older than the watermark
    is evicted (bounded state — the requirement for an infinite stream).
    The streaming face of ``functions/dedup.py::dedup_exact``."""
    with_time = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return with_time.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_stream(
    events: DataFrame, gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-sessionization via the native ``session_window``:
    merges events closer than ``gap`` into one window per user, emitting
    (user_id, session start/end, n_events) when the watermark closes the
    session. The streaming face of ``functions/timeseries.py::sessionize``."""
    with_time = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            (F.unix_micros(F.col("win.start")) * 1000).alias("session_start_ns"),
            (F.unix_micros(F.col("win.end")) * 1000).alias("session_end_ns"),
            "n_events",
        )
    )


def stream_cells_into_store(
    cells_stream: DataFrame,
    store,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous ingestion into the versioned CellStore: every
    micro-batch commits one O(batch) **delta** snapshot — the reference's
    memtable-flush write path (writer.rs:56-79) driven by Structured
    Streaming's checkpointed source tracking instead of a server loop.

    Delivery is at-least-once at the batch level, but the store's LSM
    shadowing makes re-appends idempotent PER CELL COORDINATE: a replayed
    batch writes the same (row_key, family, qualifier, ts) keys, and
    ``read()`` keeps only the newest occurrence — so the observable table
    is exactly-once. Pair with ``jobs.workers.compaction_worker`` to fold
    the accumulating deltas.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """

    def _commit(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.append(batch_df)

    w = cells_stream.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


_STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update_stats(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-event-type running (count, exact-cents sum, max)."""
    if state.exists:
        n, sum_cents, max_value = state.get
    else:
        n, sum_cents, max_value = 0, 0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        sum_cents += int(round(pdf["value"].mul(100).round().sum())) if len(pdf) else 0
        if len(pdf):
            max_value = max(max_value, float(pdf["value"].max()))
    state.update((n, sum_cents, max_value))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n": [n],
            "total": [sum_cents / 100.0],
            "max_value": [max_value],
        }
    )


def running_stats_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-series running stats that Spark's
    built-in streaming aggs can't express incrementally with exact
    fixed-point sums. Arrow-batched state updates, update-mode output."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_stats,
        outputStructType=_STATS_OUT_SCHEMA,
        stateStructType=_STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def click_attribution_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    click by the same user within the preceding ``window``.

    Both sides carry their own watermark, and the join range condition
    (``p_ts ∈ [c_ts, c_ts + window]``) lets Spark bound state: click
    state older than watermark+window and purchase state older than
    watermark are evicted, so an infinite stream joins in finite memory.
    Inner-join emission is match-driven (not watermark-cut), so the
    availableNow replay emits exactly the batch join result — the
    property the oracle pins.
    """
    base = events.withColumn(
        "ets", F.timestamp_micros(F.expr("ts div 1000"))
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ets").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ets").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("c_ts")) * 1000).alias("click_ts_ns"),
        (F.unix_micros(F.col("p_ts")) * 1000).alias("purchase_ts_ns"),
    )
