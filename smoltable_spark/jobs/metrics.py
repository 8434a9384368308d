"""Per-table metrics timeseries — the reference's built-in analytics app.

Every reference table gets a companion ``_mtx_<t>`` table of f64 points
keyed like ``lat#write#cell`` / ``stats#row_cnt``, FIFO-capped at ~1 MB
(reference server/src/metrics.rs:10-45, cap server/src/env.rs:25-31); the
dashboard reads the newest 720 points per series via multi_get with
``cell_limit: 720`` (server/src/html.rs:11-196).

Here a metrics table IS a cells table (FIXTURES F7): row_key = series
name, family 'value', qualifier '', ts = event nanos, v_f64 = the point.
Reads reuse the engine's own multi_get/version-limit operators — the
metrics system is a consumer of the engine, exactly like the reference.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from smoltable_spark.api import QueryRowInput
from smoltable_spark.operators.read import multi_get_cells
from smoltable_spark.schema import CELLS_SCHEMA
from smoltable_spark.sources.store import CellStore


class MetricsTable:
    """Append-only f64 series on a CellStore, FIFO-retained by byte cap."""

    def __init__(self, store: CellStore, cap_bytes: int = 1_000_000):
        self.store = store
        self.cap_bytes = cap_bytes

    def record(self, points: list[tuple[str, float]], ts_nanos: int | None = None) -> None:
        """Append (series, value) points (one commit — writer.rs parity)."""
        ts = time.time_ns() if ts_nanos is None else ts_nanos
        self.record_series([(series, v, ts) for series, v in points])

    def record_series(self, points: list[tuple[str, float, int]]) -> None:
        """Append (series, value, ts_nanos) points in ONE atomic commit —
        a write batch with explicit per-cell timestamps (reference
        writer.rs:28-33: each cell write carries its own optional ts)."""
        rows = [
            {
                "row_key": series,
                "family": "value",
                "qualifier": "",
                "ts": ts,
                "vtype": "f64",
                "v_str": None,
                "v_bool": None,
                "v_byte": None,
                "v_i32": None,
                "v_i64": None,
                "v_f32": None,
                "v_f64": float(v),
            }
            for series, v, ts in points
        ]
        df = self.store.spark.createDataFrame(rows, CELLS_SCHEMA)
        self.store.append(df)

    def read_series(self, names: list[str], limit: int = 720) -> DataFrame:
        """Newest ``limit`` points per series, newest-first — the dashboard
        read (multi_get + per-column cell_limit, html.rs:42-47)."""
        cells = self.store.read()
        out = multi_get_cells(
            cells, [QueryRowInput(n, column_cell_limit=limit) for n in names]
        )
        return out.select(
            F.col("row_key").alias("series"), "ts", F.col("v_f64").alias("value")
        ).orderBy("series", F.col("ts").desc())

    def enforce_retention(self) -> None:
        """FIFO cap: when over the byte cap, drop the oldest half of the
        points (the reference lets fjall FIFO-compact the oldest segments,
        server/src/metrics.rs:14-24; the snapshot-rewrite equivalent is a
        tail drop at the exact median timestamp). The cut is the EXACT
        interpolated median of ts — deterministic and oracle-mirrorable
        (``median(ts)`` in ANSI SQL), unlike approxQuantile. Metrics
        tables are byte-capped small by construction, so an exact
        percentile here is one cheap aggregate even when the engine
        itself holds 100 TB."""
        if self.store.disk_space_usage() <= self.cap_bytes:
            self.store.vacuum(keep_last=1)
            return
        cells = self.store.read().drop("lg")
        cutoff = cells.select(
            F.expr("percentile(ts, 0.5)").alias("m")
        ).collect()[0]["m"]
        # a filter of read() keeps coordinates unique: skip the dedup
        # window (round 12 — same argument as compact())
        self.store.write(
            cells.filter(F.col("ts") >= cutoff), assume_unique_coords=True
        )
        self.store.vacuum(keep_last=1)
