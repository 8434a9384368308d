"""Phase-split profiler for rel_pagerank (r14, guide §1): noop-sink
timings for (a) the edge build+checkpoint, (b) the 2-iteration rank loop
as shipped, and (c) a candidate variant that divides rank by degree on
the NODE table before the edge join (shuffles r/deg per node instead of
joining deg into the edge-sized frame per iteration).

Usage: python tools/profile_pagerank.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from smoltable_spark.session import get_spark
    from smoltable_spark.sources.relational import load_table
    from smoltable_spark.queries_analytics import _PR_SCALE

    spark = get_spark("profile_pagerank", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for rep in range(2):
        t0 = time.time()
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        pairs = (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .select(
                F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            )
            .distinct()
            .localCheckpoint()
        )
        edges = (
            pairs.union(
                pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .repartition("src")
            .localCheckpoint()
        )
        t1 = time.time()
        print(f"[{rep}] edges build+ckpt: {t1-t0:.3f}s  n={edges.count()}")

        # shipped loop
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        ranks = deg.select(
            F.col("src").alias("node"), F.lit(_PR_SCALE).cast("long").alias("r")
        )
        for _ in range(2):
            contrib = (
                edges.join(ranks, edges.src == ranks.node)
                .join(deg, "src")
                .select(F.col("dst").alias("node"), F.expr("r div deg").alias("c"))
            )
            ranks = contrib.groupBy("node").agg(
                (
                    F.lit(int(0.15 * _PR_SCALE)) + F.expr("(85 * sum(c)) div 100")
                ).cast("long").alias("r")
            )
        print(f"[{rep}] shipped 2-iter loop: {noop(ranks):.3f}s")

        # variant: rank/deg per NODE, then one edge join per iteration
        deg2 = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        ranks2 = deg2.select(
            F.col("src").alias("node"), F.lit(_PR_SCALE).cast("long").alias("r")
        )
        for _ in range(2):
            per_node = ranks2.join(
                deg2, ranks2.node == deg2.src
            ).select(F.col("node"), F.expr("r div deg").alias("c"))
            contrib = edges.join(
                per_node, edges.src == per_node.node
            ).select(F.col("dst").alias("node"), "c")
            ranks2 = contrib.groupBy("node").agg(
                (
                    F.lit(int(0.15 * _PR_SCALE)) + F.expr("(85 * sum(c)) div 100")
                ).cast("long").alias("r")
            )
        print(f"[{rep}] node-divide variant: {noop(ranks2):.3f}s")

    spark.stop()


if __name__ == "__main__":
    main()
