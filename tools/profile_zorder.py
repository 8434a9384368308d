"""Phase split of the RangeZorder lifecycle rows (guide §1): time each
store operation of wc_store_zorder_rebucket / wc_store_zorder_compact_cycle
separately, plus a direct probe of the compact double-pass (boundary
percentile over read() + rewrite of read()).

Usage: python tools/profile_zorder.py [--runs 2]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from smoltable_spark.session import get_spark

    spark = get_spark("profile_zorder", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from smoltable_spark.api import ColumnFamilyDef
    from smoltable_spark.queries_core import _Z_DAY_NS, _events_cells_seq
    from smoltable_spark.queries_util import scratch_dir
    from smoltable_spark.sources.store_layout import RangeZorderCellStore

    for run in range(args.runs):
        t = {}

        def mark(name, t0):
            t[name] = round(time.monotonic() - t0, 3)

        cells = _events_cells_seq(spark, sf_dir, mod=4)
        etype = F.split(F.col("row_key"), "#").getItem(0)
        store = RangeZorderCellStore(
            spark,
            scratch_dir("smoltable_zprof_") + "/store",
            b_bucket=lambda: F.expr(f"(ts div {_Z_DAY_NS}) % 8"),
            bits=3,
        )
        store.save_families([ColumnFamilyDef("value")])

        base_cells = cells.filter(etype.isin("click", "view"))
        t0 = time.monotonic()
        store._ensure_boundaries(base_cells)
        mark("base_boundaries", t0)
        t0 = time.monotonic()
        v_base = store.write(base_cells, seq_col="_seq")
        mark("base_write", t0)

        t0 = time.monotonic()
        v_delta = store.append(
            cells.filter(etype.isin("error", "purchase", "signup")),
            seq_col="_seq",
        )
        mark("append", t0)

        # compact, split into its two passes
        from smoltable_spark.schema import CELL_COLUMNS

        n = store.current_version()
        t0 = time.monotonic()
        fold = store.read().select(*CELL_COLUMNS)
        store._write_boundaries(fold, at_version=n + 1)
        mark("compact_boundaries_pass", t0)
        t0 = time.monotonic()
        v_compacted = store.write(fold, assume_unique_coords=True)
        mark("compact_write_pass", t0)

        lo, hi = "error#", "error#~"
        all_days = list(range(8))

        t0 = time.monotonic()
        for version in (v_compacted, v_delta):
            out = store.key_range_scan(lo, hi, b_values=all_days, version=version)
            out.agg(
                F.count(F.lit(1)), F.countDistinct("row_key"),
                F.sum(F.round(F.col("v_f64") * 100).cast("long")),
                F.min("ts"), F.max("ts"),
            ).collect()
        mark("range_aggs", t0)

        t0 = time.monotonic()
        for version in (v_compacted, v_delta):
            a_vals = list(
                range(
                    store._bucket_of(lo, version),
                    store._bucket_of(hi, version) + 1,
                )
            )
            store.box_scan(a_vals, all_days, version=version).count()
        mark("scanned_counts", t0)

        t["total"] = round(sum(t.values()), 3)
        print(f"run {run}: {t}", flush=True)


if __name__ == "__main__":
    main()
