"""Phase-split profiler for dedup_containment (r14, guide §1):
replicates containment_near_duplicates' internals with timing marks so
the expensive phase is measured, not assumed. Phases: postings
materialization (pall) / anchors+guard / candidate pair formation /
exact verify. Asserts the final count matches the library function.

Usage: python tools/profile_containment.py  (env: SPARK_GRAFT_SF_DIR/CPUS)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F, Window


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from smoltable_spark.session import get_spark
    from smoltable_spark.sources.relational import load_table
    from smoltable_spark.functions import dedup
    from smoltable_spark.functions.dedup import doc_shingles, jaccard_pairs
    from smoltable_spark.functions.hashing import md5_long

    k, threshold, max_df, min_postings = 3, 0.8, 20, 2
    id_col, text_col = "doc_id", "text"

    spark = get_spark("profile_containment", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for rep in range(2):
        docs = load_table(spark, sf_dir, "documents")
        t0 = time.time()
        sh = doc_shingles(docs, text_col, id_col, k)
        shh = sh.select(
            F.col(id_col), md5_long(F.col("shingle")).alias("hsh")
        ).distinct()
        dfs = (
            shh.groupBy("hsh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= 2)
        )
        pall = shh.join(dfs, "hsh").localCheckpoint(eager=True)
        t1 = time.time()
        rare_posts = pall.filter(F.col("df") <= max_df).select(id_col, "hsh")
        wr = Window.partitionBy(id_col).orderBy(
            F.col("df").asc(), F.col("hsh").asc()
        )
        anchors = (
            pall.withColumn("_rk", F.row_number().over(wr))
            .filter(F.col("_rk") <= min_postings)
            .select("hsh", "df")
            .distinct()
            .localCheckpoint(eager=True)
        )
        anchors.agg(F.max("df").alias("mx")).collect()
        t2 = time.time()
        anchor_posts = pall.join(anchors.select("hsh"), "hsh").select(
            id_col, "hsh"
        )
        posts = rare_posts.union(anchor_posts).distinct()
        a = posts.select("hsh", F.col(id_col).alias("id_a"))
        b = posts.select(F.col("hsh").alias("_hb"), F.col(id_col).alias("id_b"))
        cands = (
            a.join(
                b,
                (F.col("hsh") == F.col("_hb"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b")
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_cands = cands.count()
        t3 = time.time()
        jac = jaccard_pairs(docs, cands, text_col, id_col, k)
        num, den = round(threshold * 1000), 1000
        mn = F.least(F.col("size_a"), F.col("size_b"))
        n_out = jac.filter(F.col("common") * den >= num * mn).count()
        t4 = time.time()
        print(
            f"[{rep}] postings={t1-t0:.3f} anchors+guard={t2-t1:.3f} "
            f"pairs={t3-t2:.3f} (n_cands={n_cands}) verify={t4-t3:.3f} "
            f"(n_out={n_out}) total={t4-t0:.3f}"
        )
        if rep == 0:
            ref = dedup.containment_near_duplicates(
                docs, k=k, threshold=threshold, max_df=max_df
            ).count()
            assert ref == n_out, (ref, n_out)
            print(f"    library count matches: {ref}")

    spark.stop()


if __name__ == "__main__":
    main()
