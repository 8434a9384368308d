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


class TestStoreCdc:
    @staticmethod
    def _mk_cells(spark, rows):
        """rows: (row_key, ts, value) → canonical cells."""
        from smoltable_spark.schema import CELLS_SCHEMA

        recs = [
            {
                "row_key": rk, "family": "value", "qualifier": "",
                "ts": ts, "vtype": "f64", "v_str": None, "v_bool": None,
                "v_byte": None, "v_i32": None, "v_i64": None,
                "v_f32": None, "v_f64": float(v),
            }
            for rk, ts, v in rows
        ]
        return spark.createDataFrame(recs, CELLS_SCHEMA)

    def _setup(self, spark, tmp_path):
        from smoltable_spark.api import ColumnFamilyDef
        from smoltable_spark.sources.store import CellStore
        from smoltable_spark.streaming.store_cdc import StoreChangeRollup

        store = CellStore(spark, str(tmp_path / "store"))
        store.save_families([ColumnFamilyDef("value", lg="")])
        rollup = StoreChangeRollup(
            spark, str(tmp_path / "roll"), keys=["family"],
            sums={"total": "cast(v_f64 as long)"}, store=store,
        )
        return store, rollup

    def _drain(self, spark, store, rollup, ckpt):
        from smoltable_spark.streaming.store_cdc import (
            stream_store_changes, stream_store_rollup)

        q = stream_store_rollup(
            stream_store_changes(spark, store), rollup, ckpt)
        assert q.awaitTermination(300)

    def test_incremental_equals_recompute_and_replay_is_idempotent(
        self, spark, tmp_path
    ):
        store, rollup = self._setup(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        store.append(self._mk_cells(spark, [("a", 1, 10), ("b", 2, 5)]))
        self._drain(spark, store, rollup, ckpt)
        store.append(self._mk_cells(spark, [("c", 3, 7)]))
        self._drain(spark, store, rollup, ckpt)  # restart, same checkpoint
        out = rollup.result().collect()
        assert [(r["family"], r["total"], r["_rows"]) for r in out] == [
            ("value", 22, 3)
        ]
        assert rollup.processed_rows() == store.approximate_cell_count() == 3
        # foreachBatch replay of an already-folded batch must be a no-op
        batch = store.read().withColumn("v", F.lit(1))
        meta_before = rollup._meta()
        rollup.process_batch(batch, batch_id=0)  # stale id: skipped
        assert rollup._meta() == meta_before
        assert rollup.processed_rows() == 3

    def test_base_rewrite_raises_resync_error(self, spark, tmp_path):
        store, rollup = self._setup(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        store.append(self._mk_cells(spark, [("a", 1, 1)]))
        self._drain(spark, store, rollup, ckpt)
        store.compact()  # base rewrite: changes no longer derivable
        with pytest.raises(Exception, match="base rewrite"):
            self._drain(spark, store, rollup, ckpt)
        # the rollup was not corrupted by the failed batch
        assert rollup.processed_rows() == 1

    def test_preexisting_base_is_initial_snapshot_not_changes(
        self, spark, tmp_path
    ):
        """A store whose chain STARTS with a base (write) before the
        rollup is attached: the base files are the initial snapshot; the
        first drain folds them plus any deltas, and only base rewrites
        AFTER attach raise."""
        from smoltable_spark.api import ColumnFamilyDef
        from smoltable_spark.sources.store import CellStore
        from smoltable_spark.streaming.store_cdc import StoreChangeRollup

        store = CellStore(spark, str(tmp_path / "store"))
        store.save_families([ColumnFamilyDef("value", lg="")])
        store.write(self._mk_cells(spark, [("a", 1, 3), ("b", 2, 4)]))
        rollup = StoreChangeRollup(
            spark, str(tmp_path / "roll"), keys=["family"],
            sums={"total": "cast(v_f64 as long)"}, store=store,
        )
        store.append(self._mk_cells(spark, [("c", 3, 5)]))
        self._drain(spark, store, rollup, str(tmp_path / "ckpt"))
        out = rollup.result().collect()
        assert [(r["family"], r["total"], r["_rows"]) for r in out] == [
            ("value", 12, 3)
        ]
