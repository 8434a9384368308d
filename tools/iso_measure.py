"""Isolated min-of-N re-measure of named registry queries — the same
protocol as bench.py's _isolated_min (fresh session, full warmup, solo
runs) so numbers are comparable to the gate's isolated-confirm rows.

Usage: python tools/iso_measure.py q1 q2 ... [--runs 3] [--tag label]
Prints one JSON line: {"tag":..., "queries": {name: min_sec}}
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    # argparse, not hand-rolled filtering (ADVICE r12: removing option
    # VALUES from the positional list by value silently dropped a query
    # whose name equaled the --tag/--runs argument)
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="registry query names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="iso")
    args = ap.parse_args()
    names, runs, tag = args.names, args.runs, args.tag

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from smoltable_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("smoltable_spark_iso", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()

    # identical warmup to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from smoltable_spark.sources.relational import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    from pyspark.sql import functions as _F

    small = spark.range(100).withColumnRenamed("id", "k")
    (
        spark.range(10_000)
        .withColumnRenamed("id", "k")
        .join(_F.broadcast(small), "k")
        .groupBy((_F.col("k") % 10).alias("g"))
        .count()
        .count()
    )

    out: dict[str, float] = {}
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times.append(time.time() - t0)
        out[name] = round(min(times), 3)
        print(f"# {name}: min {out[name]}s of {[round(t,3) for t in times]}",
              file=sys.stderr)
    print(json.dumps({"tag": tag, "queries": out}))


if __name__ == "__main__":
    main()
