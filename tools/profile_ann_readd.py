"""Phase-split profiler for ann_ivf_readd (r14, guide §1): times each
lifecycle phase (build / delete / upsert-fold append / serve / compact /
serve) so the commit-floor claim is measured, not assumed.

Usage: python tools/profile_ann_readd.py  (env: SPARK_GRAFT_SF_DIR/CPUS)
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
    from smoltable_spark.functions import similarity
    from smoltable_spark.functions.ann_index import (
        append_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
    )
    from smoltable_spark.queries_util import scratch_dir

    spark = get_spark("profile_ann_readd", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for rep in range(2):
        emb = load_table(spark, sf_dir, "embeddings")
        path = scratch_dir("smoltable_prof_readd_") + "/ivf"
        t0 = time.time()
        similarity.build_ivf_index(emb, path, n_centroids=8)
        t1 = time.time()
        victims = emb.filter(F.col("vec_id") % 7 == 6)
        delete_from_ivf_index(spark, path, victims.select("vec_id"))
        t2 = time.time()
        replacement = (
            victims.alias("e")
            .join(emb.alias("p"), F.col("p.vec_id") == F.col("e.vec_id") - 1)
            .select(
                F.col("e.vec_id").alias("vec_id"),
                F.col("p.embedding").alias("embedding"),
            )
        )
        append_ivf_index(spark, path, replacement)
        t3 = time.time()
        t = similarity.ivf_tombstones(spark, path)
        if t is not None:
            assert t.join(replacement.select("vec_id"), "vec_id").count() == 0
        t4 = time.time()
        queries = emb.filter(F.col("vec_id") < 5)

        def serve():
            return similarity.query_ivf_index(
                spark, path, queries, k=10, nprobe=2
            ).withColumn("rank", F.col("rank").cast("int"))

        upserted = sorted(map(tuple, serve().collect()))
        t5 = time.time()
        compact_ivf_index(spark, path)
        t6 = time.time()
        compacted = serve()
        assert sorted(map(tuple, compacted.collect())) == upserted
        t7 = time.time()
        compacted.count()
        t8 = time.time()
        print(
            f"[{rep}] build={t1-t0:.3f} delete={t2-t1:.3f} "
            f"append_fold={t3-t2:.3f} tomb_assert={t4-t3:.3f} "
            f"serve1={t5-t4:.3f} compact={t6-t5:.3f} serve2+assert={t7-t6:.3f} "
            f"final_count={t8-t7:.3f} total={t8-t0:.3f}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
