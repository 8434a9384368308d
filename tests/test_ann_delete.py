"""IVF index deletes: tombstones + targeted compaction — round 9.

The maintenance family's missing third op: ``append_ivf_index`` is the
memtable flush, ``delete_from_ivf_index`` writes tombstones that
``query_ivf_index`` masks at serve time, ``compact_ivf_index`` folds
them by rewriting ONLY the affected list partitions. Serving must be
bit-identical across all three states (freshly built on survivors /
tombstoned / compacted).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from smoltable_spark.functions import similarity
from smoltable_spark.functions.ann_index import (
    compact_ivf_index,
    delete_from_ivf_index,
)
from smoltable_spark.sources.relational import load_table


@pytest.fixture()
def built(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, n_centroids=8)
    return emb, path


def _serve(spark, path, emb, k=10):
    q = emb.filter(F.col("vec_id") < 5)
    return sorted(
        map(
            tuple,
            similarity.query_ivf_index(spark, path, q, k=k, nprobe=2).collect(),
        )
    )


def test_delete_masks_at_serve_time(spark, sf_dir, tmp_path, built):
    emb, path = built
    victims = emb.filter(F.col("vec_id") % 7 == 6).select("vec_id")
    n_victims = victims.count()
    n = delete_from_ivf_index(spark, path, victims)
    assert n == n_victims > 0
    got = _serve(spark, path, emb)
    # reference: an index freshly built on the surviving corpus under
    # the SAME frozen quantizer (centroids derive from vec_id < 8 of the
    # full corpus, so assignments agree) must serve identical results
    ref_path = str(tmp_path / "ivf_ref")
    cents = similarity.with_quantized_norm(
        emb.filter(F.col("vec_id") < 8), "embedding"
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("q").alias("cq"),
        F.col("nrm2").alias("cn2"),
    )
    similarity.build_ivf_index(
        emb.filter(F.col("vec_id") % 7 != 6), ref_path, centroids=cents
    )
    assert got == _serve(spark, ref_path, emb)
    # deleted ids never appear as neighbors
    assert not any(r[1] % 7 == 6 for r in got)


def test_compact_is_invisible_and_clears_tombstones(spark, sf_dir, built):
    spark_, path = None, None  # readability
    emb, path = built
    delete_from_ivf_index(
        spark, path, emb.filter(F.col("vec_id") % 7 == 6).select("vec_id")
    )
    before = _serve(spark, path, emb)
    stats = compact_ivf_index(spark, path)
    assert stats["tombstones"] > 0 and stats["lists_rewritten"] > 0
    assert _serve(spark, path, emb) == before  # bit-identical
    assert similarity.ivf_tombstones(spark, path) is None
    # the physical rows are gone, not just masked
    remaining = spark.read.parquet(path).filter(F.col("vec_id") % 7 == 6)
    assert remaining.count() == 0
    # idempotent: nothing left to fold
    assert compact_ivf_index(spark, path) == {
        "tombstones": 0,
        "lists_rewritten": 0,
    }


def test_compact_rewrites_only_affected_lists(spark, sf_dir, built):
    emb, path = built
    # tombstone ONE existing vector → at most one affected list
    delete_from_ivf_index(
        spark, path, emb.filter(F.col("vec_id") == 6).select("vec_id")
    )
    def files_by_list():
        out = {}
        for d in os.listdir(path):
            if d.startswith("list_id="):
                out[d] = sorted(
                    f for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")
                )
        return out
    before = files_by_list()
    stats = compact_ivf_index(spark, path)
    assert stats["lists_rewritten"] == 1
    after = files_by_list()
    changed = [d for d in before if after.get(d) != before[d]]
    assert len(changed) <= 1  # every other list's files byte-stable


def test_delete_absent_ids_is_noop(spark, built):
    emb, path = built
    ghosts = spark.createDataFrame([(10_000_000,), (10_000_001,)], "vec_id long")
    assert delete_from_ivf_index(spark, path, ghosts) == 0
    assert similarity.ivf_tombstones(spark, path) is None
    assert not any(
        d.startswith(".staging") for d in os.listdir(path)
    )  # staging cleaned up


def test_incremental_delete_batches_accumulate(spark, built):
    emb, path = built
    delete_from_ivf_index(
        spark, path, emb.filter(F.col("vec_id") == 6).select("vec_id")
    )
    delete_from_ivf_index(
        spark, path, emb.filter(F.col("vec_id") == 13).select("vec_id")
    )
    t = similarity.ivf_tombstones(spark, path)
    assert sorted(r["vec_id"] for r in t.collect()) == [6, 13]
    got = _serve(spark, path, emb)
    assert not any(r[1] in (6, 13) for r in got)


def test_ivfpq_honors_tombstones_and_compact(spark, sf_dir, tmp_path):
    """The maintenance layout is shared: deletes committed by
    delete_from_ivf_index mask ADC serving on an IVF-PQ index too, and
    compact folds the codes rows (all M subcodes of a victim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(emb, path, n_centroids=8, m=8)

    def serve():
        q = emb.filter(F.col("vec_id") < 5)
        return sorted(
            map(
                tuple,
                similarity.query_ivfpq_index(
                    spark, path, q, k=10, nprobe=2, m=8
                ).collect(),
            )
        )

    before = serve()
    assert any(r[1] % 7 == 6 for r in before)  # victims present pre-delete
    n = delete_from_ivf_index(
        spark, path, emb.filter(F.col("vec_id") % 7 == 6).select("vec_id")
    )
    assert n > 0
    masked = serve()
    assert not any(r[1] % 7 == 6 for r in masked)
    stats = compact_ivf_index(spark, path)
    assert stats["lists_rewritten"] > 0
    assert serve() == masked
    assert (
        spark.read.parquet(path).filter(F.col("vec_id") % 7 == 6).count() == 0
    )
