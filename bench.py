"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "total_headline_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...}

Run: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Methodology: one shared session (AQE on), each query executed once with a
full materialization (count of the result — forces every operator but
keeps driver-side collection out of the measurement). A tiny warmup query
first absorbs JVM/codegen startup so per-query numbers reflect execution,
not session boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline set: one per operator class — scan, filter, version-window,
#: count, agg, join chain, rollup, window-rank, dedup (LSH), ANN, text,
#: multimodal
HEADLINE = [
    "wc_scan_all",
    "wc_scan_prefix",
    "wc_filter_key",
    "wc_scan_version_limit",
    "wc_count",
    "rel_tpch_q1",
    "rel_tpch_q3",
    "rel_tpch_q5",
    "rel_events_hourly",
    "rel_top_users_by_spend",
    "txt_analyze",
    "dedup_exact",
    "dedup_minhash",
    "ann_cosine_topk",
    "mm_features",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from smoltable_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("smoltable_spark_bench", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()

    # warmup: absorb JVM + codegen startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
