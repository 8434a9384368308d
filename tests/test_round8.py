"""Round-8 tests: ADVICE r7 hardening (IVF append crash recovery) and
the new driver-row machinery (reference locality-group read-amp numbers,
table stats, CellStore CDC streaming source)."""

import os

import pytest
from pyspark.sql import functions as F


class TestIvfAppendCrashRecovery:
    def test_append_fails_fast_on_leftover_staging(self, spark, sf_dir, tmp_path):
        """ADVICE r7: a leftover .staging-append dir means a previous
        append crashed mid-publish; a blind retry would re-publish the
        whole delta and DUPLICATE the partially-published vectors. The
        append must refuse to run and leave the staging dir untouched
        for reconciliation."""
        from smoltable_spark.functions import similarity
        from smoltable_spark.functions.ann_index import append_ivf_index
        from smoltable_spark.sources.relational import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cents = similarity.with_quantized_norm(
            emb.filter(F.col("vec_id") < 4), "embedding"
        ).select(
            F.col("vec_id").alias("cid"),
            F.col("q").alias("cq"),
            F.col("nrm2").alias("cn2"),
        )
        idx = str(tmp_path / "idx")
        similarity.build_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 0), idx, centroids=cents
        )
        # simulate the crashed publish
        staging = os.path.join(idx, ".staging-append")
        os.makedirs(os.path.join(staging, "list_id=0"))
        marker = os.path.join(staging, "list_id=0", "part-orphan.parquet")
        open(marker, "w").close()

        with pytest.raises(IOError, match="staging"):
            append_ivf_index(
                spark, idx, emb.filter(F.col("vec_id") % 2 == 1)
            )
        # staging left in place for inspection, nothing published
        assert os.path.exists(marker)
