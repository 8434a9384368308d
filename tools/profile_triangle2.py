"""A/B the rel_triangle_count closing-join strategy (r14, guide §3.1):
SMJ (shipped) vs SHUFFLE_HASH hints on the build sides. Interleaved
within one session; volumes identical by construction.

Usage: python tools/profile_triangle2.py
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

    spark = get_spark("profile_triangle2", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

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
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t_id"),
        F.greatest(F.col("rku"), F.col("rkv")).alias("t_rk"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select("s", F.col("t_id").alias("t1_id"), F.col("t_rk").alias("t1_rk"))
    o2 = oriented.select(
        F.col("s").alias("s2"), F.col("t_id").alias("t2_id"), F.col("t_rk").alias("t2_rk")
    )
    closing = oriented.select(F.col("s").alias("cs"), F.col("t_id").alias("ct"))

    def smj():
        wedges = o1.join(
            o2, (F.col("s") == F.col("s2")) & (F.col("t1_rk") < F.col("t2_rk"))
        ).select("t1_id", "t2_id")
        return wedges.join(
            closing,
            (F.col("t1_id") == F.col("cs")) & (F.col("t2_id") == F.col("ct")),
        )

    def shj():
        wedges = o1.join(
            o2.hint("shuffle_hash"),
            (F.col("s") == F.col("s2")) & (F.col("t1_rk") < F.col("t2_rk")),
        ).select("t1_id", "t2_id")
        return wedges.join(
            closing.hint("shuffle_hash"),
            (F.col("t1_id") == F.col("cs")) & (F.col("t2_id") == F.col("ct")),
        )

    def shj_close_only():
        wedges = o1.join(
            o2, (F.col("s") == F.col("s2")) & (F.col("t1_rk") < F.col("t2_rk"))
        ).select("t1_id", "t2_id")
        return wedges.join(
            closing.hint("shuffle_hash"),
            (F.col("t1_id") == F.col("cs")) & (F.col("t2_id") == F.col("ct")),
        )

    for rep in range(3):
        for name, fn in (("smj", smj), ("shj_both", shj), ("shj_close", shj_close_only)):
            t0 = time.time()
            n = fn().count()
            print(f"[{rep}] {name}: {time.time()-t0:.3f}s tri={n}")

    spark.stop()


if __name__ == "__main__":
    main()
