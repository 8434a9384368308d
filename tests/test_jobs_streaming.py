"""Workers (§2.9), metrics table (§2.8), and the streaming extension."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from smoltable_spark.api import ColumnFamilyDef
from smoltable_spark.jobs import MetricsTable, gc_worker, row_count_worker, system_metrics_worker
from smoltable_spark.sources.store import CellStore
from smoltable_spark.streaming import (
    events_to_cells_stream,
    hourly_rollup_stream,
    running_stats_stream,
    stream_events,
)

from tests.conftest import make_cells


@pytest.fixture()
def store(spark, tmp_path):
    s = CellStore(spark, str(tmp_path / "tbl"))
    s.save_families([ColumnFamilyDef("value", version_limit=2)])
    rows = [("r1", "value", "q", ts, "i64", ts) for ts in range(1, 6)]
    s.write(make_cells(spark, rows))
    return s


def test_metrics_record_and_read(spark, tmp_path, store):
    m = MetricsTable(CellStore(spark, str(tmp_path / "mtx")))
    m.record([("lat#write#cell", 1.5), ("stats#row_cnt", 10.0)], ts_nanos=100)
    m.record([("lat#write#cell", 2.5)], ts_nanos=200)
    out = m.read_series(["lat#write#cell"], limit=720).collect()
    assert [(r["ts"], r["value"]) for r in out] == [(200, 2.5), (100, 1.5)]
    # newest-N semantics
    out1 = m.read_series(["lat#write#cell"], limit=1).collect()
    assert [(r["ts"], r["value"]) for r in out1] == [(200, 2.5)]


def test_gc_worker_deletes_and_logs(spark, tmp_path, store):
    m = MetricsTable(CellStore(spark, str(tmp_path / "mtx2")))
    deleted = gc_worker(store, m, now_nanos=10**18)
    assert deleted == 3  # 5 versions, limit 2
    pts = m.read_series(["gc#del_cnt"]).collect()
    assert pts[0]["value"] == 3.0


def test_row_count_and_system_workers(spark, tmp_path, store):
    m = MetricsTable(CellStore(spark, str(tmp_path / "mtx3")))
    rc = row_count_worker(store, m, now_nanos=1)
    assert rc == {"row_count": 1, "cell_count": 5}
    sysm = system_metrics_worker(store, m, now_nanos=2)
    assert sysm["disk_bytes"] > 0 and sysm["file_count"] >= 1
    series = {r["series"] for r in m.read_series(
        ["stats#row_cnt", "stats#cell_cnt", "stats#du", "stats#seg_cnt"]).collect()}
    assert series == {"stats#row_cnt", "stats#cell_cnt", "stats#du", "stats#seg_cnt"}


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    return str(d)


def _run_stream(df, tmp_path, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_melt_matches_batch(spark, tmp_path, events_dir):
    from smoltable_spark.sources.relational import events_cells

    st = events_to_cells_stream(stream_events(spark, events_dir))
    _run_stream(st, tmp_path, "cells_stream")
    got = spark.sql("SELECT count(*) c, sum(ts div 1000000) s FROM cells_stream").collect()[0]
    batch = events_cells(spark, "/root/testdata/sf0.001").agg(
        F.count(F.lit(1)).alias("c"), F.sum(F.expr("ts div 1000000")).alias("s")
    ).collect()[0]
    assert (got["c"], got["s"]) == (batch["c"], batch["s"])


def test_streaming_hourly_rollup_matches_batch(spark, tmp_path, events_dir):
    st = hourly_rollup_stream(stream_events(spark, events_dir))
    _run_stream(st, tmp_path, "rollup_stream")
    got = spark.sql(
        "SELECT count(*) c, sum(n_events) n FROM rollup_stream"
    ).collect()[0]
    from smoltable_spark.sources.relational import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(events_dir))
    # append mode emits only windows whose end is past the final watermark
    # (max event time − 2 h delay); apply the same cutoff to the batch side
    hour = 3_600_000_000_000
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = (max_ts // 1000) * 1000 - 2 * hour  # µs truncation like the stream
    batch = (
        ev.groupBy(F.expr("ts div 3600000000000").alias("b"), "event_type")
        .count()
        .filter((F.col("b") + 1) * hour <= wm)
        .agg(F.count(F.lit(1)).alias("c"), F.sum("count").alias("n"))
        .collect()[0]
    )
    assert (got["c"], got["n"]) == (batch["c"], batch["n"])


def test_streaming_running_stats(spark, tmp_path, events_dir):
    st = running_stats_stream(stream_events(spark, events_dir))
    _run_stream(st, tmp_path, "stats_stream", mode="update")
    rows = spark.sql(
        "SELECT * FROM stats_stream ORDER BY event_type"
    ).collect()
    assert sum(r["n"] for r in rows) == 1000  # all events counted
    for r in rows:
        assert r["max_value"] > 0 and abs(r["total"]) < 10**9


def test_streaming_dedup_drops_duplicate_ids(spark, tmp_path, events_dir):
    import shutil as _sh

    from smoltable_spark.streaming.ingest import dedup_events_stream

    # duplicate the whole file: every event_id arrives twice
    _sh.copy(events_dir + "/events.parquet", events_dir + "/events_copy.parquet")
    st = dedup_events_stream(stream_events(spark, events_dir, max_files_per_trigger=2))
    _run_stream(st, tmp_path, "dedup_stream")
    n = spark.sql("SELECT count(*) c, count(DISTINCT event_id) d FROM dedup_stream").collect()[0]
    assert n["c"] == n["d"] == 1000  # sf0.001 has 1000 unique events


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_path, events_dir):
    from smoltable_spark.functions.timeseries import session_stats
    from smoltable_spark.sources.relational import load_table
    from smoltable_spark.streaming.ingest import session_stream

    st = session_stream(stream_events(spark, events_dir), gap="1 hour")
    _run_stream(st, tmp_path, "session_stream")
    got = spark.sql(
        "SELECT user_id, session_start_ns, n_events FROM session_stream"
    ).collect()
    # batch equivalent on the same file (µs-truncated like the stream)
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", F.expr("(ts div 1000) * 1000").alias("ets")
    )
    want = session_stats(ev, key="user_id", time_col="ets", gap=3_600_000_000_000).collect()
    # Every emitted session must agree with batch exactly; sessions whose
    # end falls inside the final watermark horizon (max_ts - 2 h) are
    # legitimately unemitted (append mode only emits watermark-closed
    # sessions — at stream end the last ones stay open).
    got_map = {(r["user_id"], r["session_start_ns"]): r["n_events"] for r in got}
    want_map = {(r["user_id"], r["session_start"]): (r["n_events"], r["session_end"]) for r in want}
    horizon = max(end for _n, end in want_map.values()) - 2 * 3_600_000_000_000
    for k, n in got_map.items():
        assert k in want_map and want_map[k][0] == n, k
    for k, (n, end) in want_map.items():
        if k not in got_map:
            assert end >= horizon, (k, n, end)  # only open-horizon sessions may be missing


def test_stream_cells_into_store(spark, tmp_path, events_dir):
    """Streaming ingestion → CellStore: each micro-batch commits one delta
    snapshot; the observable table equals the batch melt; a replayed batch
    (same coordinates) is idempotent via LSM shadowing."""
    from smoltable_spark.api import ColumnFamilyDef
    from smoltable_spark.sources.relational import events_cells
    from smoltable_spark.sources.store import CellStore
    from smoltable_spark.streaming.ingest import stream_cells_into_store

    store = CellStore(spark, str(tmp_path / "ingest_store"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    cells = events_to_cells_stream(stream_events(spark, events_dir))
    q = stream_cells_into_store(
        cells, store, str(tmp_path / "ckpt_store_ingest")
    )
    q.awaitTermination(120)
    batch = events_cells(spark, "/root/testdata/sf0.001")
    assert store.read().count() == batch.count()
    v_after_stream = store.current_version()
    assert v_after_stream >= 1 and store._kind(v_after_stream) == "delta"
    # replaying the same coordinates (e.g. at-least-once redelivery) is
    # idempotent on the observable table
    store.append(batch.limit(100))
    assert store.read().count() == batch.count()
    # compaction folds the delta chain into one base
    store.compact()
    assert store._kind(store.current_version()) == "base"
    assert store.read().count() == batch.count()
