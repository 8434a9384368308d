"""Same-session interleaved A/B of the RangeZorder compact double-pass
fix (guide §1): arm A reproduces the pre-r14 shape (boundary percentile
over read() + rewrite of read(), no materialization), arm B calls the
current store.compact() (persist + one fold execution). Fresh store per
trial; arms alternate ABAB so VM drift hits both equally.

Usage: python tools/profile_compact_ab.py [--pairs 3]
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
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from smoltable_spark.session import get_spark

    spark = get_spark("profile_compact_ab", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from smoltable_spark.api import ColumnFamilyDef
    from smoltable_spark.queries_core import _Z_DAY_NS, _events_cells_seq
    from smoltable_spark.queries_util import scratch_dir
    from smoltable_spark.schema import CELL_COLUMNS
    from smoltable_spark.sources.store_layout import RangeZorderCellStore

    cells = _events_cells_seq(spark, sf_dir, mod=4)
    etype = F.split(F.col("row_key"), "#").getItem(0)

    def fresh_store():
        store = RangeZorderCellStore(
            spark,
            scratch_dir("smoltable_zab_") + "/store",
            b_bucket=lambda: F.expr(f"(ts div {_Z_DAY_NS}) % 8"),
            bits=3,
        )
        store.save_families([ColumnFamilyDef("value")])
        store.write(cells.filter(etype.isin("click", "view")), seq_col="_seq")
        store.append(
            cells.filter(etype.isin("error", "purchase", "signup")),
            seq_col="_seq",
        )
        return store

    a_times, b_times = [], []
    for p in range(args.pairs):
        # arm A: pre-r14 shape, two fold executions
        store = fresh_store()
        n = store.current_version()
        t0 = time.monotonic()
        fold = store.read().select(*CELL_COLUMNS)
        store._write_boundaries(fold, at_version=n + 1)
        store.write(fold, assume_unique_coords=True)
        a = time.monotonic() - t0
        a_times.append(round(a, 3))

        # arm B: current compact() (persisted single fold)
        store = fresh_store()
        t0 = time.monotonic()
        store.compact()
        b = time.monotonic() - t0
        b_times.append(round(b, 3))
        print(f"pair {p}: A={a:.3f} B={b:.3f}", flush=True)

    print(f"A runs {a_times} min {min(a_times)}")
    print(f"B runs {b_times} min {min(b_times)}")


if __name__ == "__main__":
    main()
