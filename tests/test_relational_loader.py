"""events loader: on-disk timestamp encodings → invariant raw-nanos LONG.

The driver's testdata has shipped ``events.ts`` as raw INT64 nanos,
TIMESTAMP(MICROS), and (historically) TIMESTAMP(NANOS) — which Spark's
parquet schema converter REFUSES outright (PARQUET_TYPE_ILLEGAL), so the
plain schema-less read never reaches ``normalize_event_ts``.  The loader
must catch that refusal and re-read with the explicit LongType schema,
which maps the physical INT64 straight to raw nanos (round-3 advice).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from smoltable_spark.sources.relational import load_table

_NS = [1_700_000_000_000_000_000, 1_700_000_001_500_000_000]


def _write_events(dirpath, ts_array):
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, os.path.join(dirpath, "events.parquet"), version="2.6")


def test_nanos_timestamp_falls_back_to_long_schema(spark, tmp_path):
    d = str(tmp_path)
    _write_events(d, pa.array(_NS, pa.timestamp("ns")))
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {1: _NS[0], 2: _NS[1]}  # exact nanos, no truncation


def test_micros_timestamp_normalized_to_nanos(spark, tmp_path):
    d = str(tmp_path)
    _write_events(
        d, pa.array([n // 1000 for n in _NS], pa.timestamp("us", tz="UTC"))
    )
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {1: _NS[0], 2: _NS[1]}


def test_raw_int64_passthrough(spark, tmp_path):
    d = str(tmp_path)
    _write_events(d, pa.array(_NS, pa.int64()))
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {1: _NS[0], 2: _NS[1]}
