"""10x scale smoke: replicate sf0.1 with shifted keys (~7.5M cells /
50k docs), run the headline operator classes, report per-op timing and
rows. Evidence that plans hold when data grows 10x: timings should grow
~linearly (scan/agg) or stay flat (pruned scans).

Usage: python tools/scale_smoke.py  (writes SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPLICAS = 10
BASE_SF = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_data")


def build(spark):
    """Replicate orders/documents/events with disjoint key spaces."""
    os.makedirs(OUT, exist_ok=True)
    specs = {
        "orders": ("o_orderkey", 10_000_000),
        "documents": ("doc_id", 1_000_000),
        "events": ("event_id", 10_000_000),
    }
    for name, (key, stride) in specs.items():
        path = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(path):
            continue
        from smoltable_spark.sources.relational import load_table

        base = load_table(spark, BASE_SF, name)
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * stride)) for i in range(REPLICAS)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(path)
        print(f"# built {name} x{REPLICAS}", file=sys.stderr)


def main():
    from smoltable_spark.session import get_spark
    from smoltable_spark.api import ScanInput
    from smoltable_spark.operators import scan_cells, count_exact
    from smoltable_spark.sources.relational import orders_cells
    from smoltable_spark.functions import dedup, text

    spark = get_spark("scale_smoke", cpus=32, shuffle_partitions=32)
    build(spark)
    from smoltable_spark.sources.relational import load_table

    results = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        results[name] = (round(time.time() - t0, 2), n)
        print(f"# {name}: {results[name]}", file=sys.stderr)

    cells = orders_cells(spark, OUT)          # 1.5M orders -> 7.5M cells
    timed("scan_all_7.5M_cells", lambda: scan_cells(cells, ScanInput(prefix="")).count())
    timed("count_exact", lambda: count_exact(cells).collect()[0]["cell_count"])
    timed(
        "prefix_scan_pruned",
        lambda: scan_cells(cells, ScanInput(prefix="order#00000000012")).count(),
    )
    docs = load_table(spark, OUT, "documents")  # 50k docs
    timed("txt_analyze_50k", lambda: text.analyze_documents(docs).count())
    timed("dedup_exact_50k", lambda: dedup.dedup_exact(docs).count())
    timed(
        "dedup_minhash_50k",
        lambda: dedup.minhash_near_duplicates(docs, num_hashes=16, bands=4).count(),
    )
    ev = load_table(spark, OUT, "events")       # 100k events
    timed(
        "events_hourly_100k",
        lambda: ev.groupBy("event_type", F.expr("ts div 3600000000000")).count().count(),
    )

    with open(os.path.join(os.path.dirname(OUT), "SCALE.md"), "w") as fh:
        fh.write("# SCALE — 10x smoke (sf0.1 replicated 10x, local[32])\n\n")
        fh.write("Replicated key spaces; same operators as bench. Compare with\n")
        fh.write("the sf0.1 steady-state numbers in the latest bench output —\n")
        fh.write("scans/aggs should scale ~linearly, pruned scans stay flat.\n\n")
        fh.write("| operation | seconds | result |\n|---|---|---|\n")
        for k, (s, n) in results.items():
            fh.write(f"| {k} | {s} | {n} |\n")
    print("wrote SCALE.md", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
