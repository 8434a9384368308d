"""Phase-split profiler for rel_triangle_count (r14, guide §1): times
each stage of the current implementation in isolation with the noop sink
where applicable, and prints wedge/edge volumes so the optimization
target is chosen from measurement, not guesswork.

Usage: python tools/profile_triangle.py  (env: SPARK_GRAFT_SF_DIR/CPUS)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from smoltable_spark.session import get_spark
    from smoltable_spark.sources.relational import load_table
    from smoltable_spark.queries_analytics import _TRI_MAX_ITEMS

    spark = get_spark("profile_triangle", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for rep in range(2):
        t0 = time.time()
        li = load_table(spark, sf_dir, "lineitem")
        ok = (
            li.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") <= _TRI_MAX_ITEMS)
            .select("l_orderkey")
        )
        items = li.join(ok, "l_orderkey").select("l_orderkey", "l_partkey")
        a = items.alias("a")
        b = items.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        t1 = time.time()
        print(f"[{rep}] edges build+ckpt: {t1-t0:.3f}s  n_edges={edges.count()}")

        deg = (
            edges.select(F.col("u").alias("n"))
            .unionByName(edges.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
        dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
        ranked = (
            edges.join(du, "u")
            .join(dv, "v")
            .withColumn("rku", F.expr("du * 4294967296 + u"))
            .withColumn("rkv", F.expr("dv * 4294967296 + v"))
        )
        fwd = F.col("rku") < F.col("rkv")
        t2 = time.time()
        oriented = ranked.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t_id"),
            F.greatest(F.col("rku"), F.col("rkv")).alias("t_rk"),
        ).localCheckpoint(eager=True)
        t3 = time.time()
        print(f"[{rep}] oriented build+ckpt: {t3-t2:.3f}s")

        o1 = oriented.select(
            "s", F.col("t_id").alias("t1_id"), F.col("t_rk").alias("t1_rk")
        )
        o2 = oriented.select(
            F.col("s").alias("s2"),
            F.col("t_id").alias("t2_id"),
            F.col("t_rk").alias("t2_rk"),
        )
        wedges = o1.join(
            o2, (F.col("s") == F.col("s2")) & (F.col("t1_rk") < F.col("t2_rk"))
        ).select("t1_id", "t2_id")
        t4 = time.time()
        n_wedges = wedges.count()
        t5 = time.time()
        print(f"[{rep}] wedge count alone: {t5-t4:.3f}s  n_wedges={n_wedges}")

        closing = oriented.select(F.col("s").alias("cs"), F.col("t_id").alias("ct"))
        t6 = time.time()
        tri = wedges.join(
            closing, (F.col("t1_id") == F.col("cs")) & (F.col("t2_id") == F.col("ct"))
        ).count()
        t7 = time.time()
        print(f"[{rep}] wedge+closing join: {t7-t6:.3f}s  tri={tri}")

        t8 = time.time()
        stats = edges.agg(F.count(F.lit(1)).alias("n_edges")).collect()[0]
        dstats = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
        ).collect()[0]
        t9 = time.time()
        print(f"[{rep}] stats jobs: {t9-t8:.3f}s  total={t9-t0:.3f}s")

        # how many oriented targets are sinks (no out-edge)? — upper bound
        # on the wedge volume a t1-must-have-out-edges semi-join removes
        srcs = oriented.select(F.col("s").alias("x")).distinct()
        with_out = o1.join(srcs, o1.t1_id == srcs.x, "left_semi").count()
        print(f"[{rep}] oriented rows whose target has out-edges: "
              f"{with_out} of {stats['n_edges']}")

    spark.stop()


if __name__ == "__main__":
    main()
