"""Streaming near-dup admission (streaming/dedup_stream.py) — round 9.

The cross-batch state is the persisted LSH index alone: batch N's admit
decision must see exactly the docs admitted by batches < N, decisions
must equal a hand-rolled sequential loop over
``minhash_dedup_incremental``, and crash/restart replay must be
idempotent under the checkpoint-binding contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    """rows: list of (doc_id, text)."""
    return spark.createDataFrame(rows, "doc_id long, text string")


#: three micro-batches with engineered relations (k=3 shingles):
#: - 0/1: near-identical within batch 0 (batch_dup, min-id-wins)
#: - 10 copies 0's text (corpus_dup in batch 1 vs admitted 0)
#: - 11 copies 1's text — 1 was REJECTED in batch 0, so 11 must still
#:   collide with 0 (1's near-dup twin) through the index ONLY if the
#:   texts verify; distinct unrelated text otherwise admits
#: - 20 copies 11 (corpus_dup in batch 2 iff 11 was admitted)
_B0 = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely different text about spark streaming state stores"),
]
_B1 = [
    (10, "the quick brown fox jumps over the lazy dog today"),
    (11, "underwater basket weaving is a fine competitive discipline"),
]
_B2 = [
    (20, "underwater basket weaving is a fine competitive discipline"),
    (21, "yet another unrelated document with its own vocabulary set"),
]


def _expected(spark, batches, **kw):
    """Sequential reference loop: admit each batch with the plain batch
    function against the growing admitted-index."""
    from smoltable_spark.functions.dedup_incremental import (
        lsh_index,
        minhash_dedup_incremental,
    )

    idx = None
    out = {}
    for bno, rows in enumerate(batches):
        batch = _docs(spark, rows)
        bidx = lsh_index(batch, **{k: v for k, v in kw.items() if k in
                                   ("num_hashes", "bands", "k")})
        if idx is None:
            cur = bidx.limit(0)
        else:
            cur = idx
        res = minhash_dedup_incremental(cur, batch, **kw)
        for r in res.collect():
            out[r["doc_id"]] = (bno, r["corpus_dup"], r["batch_dup"], r["admitted"])
        adm = res.filter(F.col("admitted") == 1).select("doc_id")
        add = bidx.join(adm, "doc_id")
        idx = add if idx is None else idx.unionByName(add)
        idx = idx.localCheckpoint(eager=True)
    return out


def _write_batches(spark, src_dir, batches):
    """One FLAT parquet file per batch with ascending mtimes, so the
    file stream source (which lists leaf files, not nested write dirs)
    yields exactly one deterministic micro-batch per file under
    maxFilesPerTrigger=1."""
    import shutil
    import tempfile

    os.makedirs(src_dir, exist_ok=True)
    for i, rows in enumerate(batches):
        dst = os.path.join(src_dir, f"batch-{i}.parquet")
        if os.path.exists(dst):
            continue
        tmp = tempfile.mkdtemp()
        _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(tmp + "/w")
        part = next(
            f for f in os.listdir(tmp + "/w") if f.endswith(".parquet")
        )
        shutil.move(os.path.join(tmp, "w", part), dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))


def _run_stream(spark, src_dir, admitter, cp):
    from smoltable_spark.streaming.dedup_stream import minhash_admit_stream

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sq = minhash_admit_stream(stream, admitter, cp).trigger(
        availableNow=True
    ).start()
    sq.awaitTermination(300)


def test_stream_admit_matches_sequential_loop(spark, tmp_path):
    from smoltable_spark.streaming.dedup_stream import MinhashAdmitter

    batches = [_B0, _B1, _B2]
    src = str(tmp_path / "src")
    _write_batches(spark, src, batches)
    adm = MinhashAdmitter(spark, str(tmp_path / "adm"))
    _run_stream(spark, src, adm, str(tmp_path / "cp"))

    want = _expected(spark, batches)
    got = {
        r["doc_id"]: (r["batch_no"], r["corpus_dup"], r["batch_dup"], r["admitted"])
        for r in adm.decisions().collect()
    }
    assert got == want
    # the engineered relations actually fired (guard against a trivially
    # all-admit run): 1 is a within-batch dup of 0, 10 a corpus dup of 0
    assert got[1][2] == 1 and got[1][3] == 0
    assert got[10][1] == 1 and got[10][3] == 0
    assert got[0][3] == 1 and got[2][3] == 1
    # 11 was admitted, so 20 must be its corpus dup
    assert got[11][3] == 1 and got[20][1] == 1 and got[20][3] == 0
    # index holds exactly the admitted docs
    idx_ids = sorted(r["doc_id"] for r in adm.index().collect())
    assert idx_ids == sorted(d for d, v in want.items() if v[3] == 1)


def test_stream_admit_restart_is_idempotent(spark, tmp_path):
    from smoltable_spark.streaming.dedup_stream import MinhashAdmitter

    batches = [_B0, _B1]
    src = str(tmp_path / "src")
    _write_batches(spark, src, batches)
    adm = MinhashAdmitter(spark, str(tmp_path / "adm"))
    cp = str(tmp_path / "cp")
    _run_stream(spark, src, adm, cp)
    before = sorted(map(tuple, adm.decisions().collect()))
    n_before = adm.processed_docs()
    # restart on the SAME checkpoint: no new files → no new batches;
    # decisions and index unchanged
    adm2 = MinhashAdmitter(spark, str(tmp_path / "adm"))
    _run_stream(spark, src, adm2, cp)
    assert sorted(map(tuple, adm2.decisions().collect())) == before
    assert adm2.processed_docs() == n_before
    # a LATE batch arriving after restart is admitted against the
    # existing index
    _write_batches(spark, src, [_B0, _B1, _B2])  # adds batch-2
    adm3 = MinhashAdmitter(spark, str(tmp_path / "adm"))
    _run_stream(spark, src, adm3, cp)
    got = {r["doc_id"]: r["admitted"] for r in adm3.decisions().collect()}
    assert 20 in got and got[20] == 0  # corpus dup of admitted 11


def test_checkpoint_binding_rejects_fresh_checkpoint(spark, tmp_path):
    from smoltable_spark.streaming.dedup_stream import MinhashAdmitter

    src = str(tmp_path / "src")
    _write_batches(spark, src, [_B0])
    adm = MinhashAdmitter(spark, str(tmp_path / "adm"))
    _run_stream(spark, src, adm, str(tmp_path / "cp"))
    with pytest.raises(ValueError, match="bound to checkpoint"):
        adm.bind_checkpoint(str(tmp_path / "cp_other"))


def test_uncommitted_batch_dirs_are_invisible(spark, tmp_path):
    """A crashed batch leaves b=<n> dirs without the meta commit — the
    read surfaces must exclude them (the meta pointer is the truth)."""
    from smoltable_spark.streaming.dedup_stream import MinhashAdmitter

    src = str(tmp_path / "src")
    _write_batches(spark, src, [_B0])
    adm = MinhashAdmitter(spark, str(tmp_path / "adm"))
    _run_stream(spark, src, adm, str(tmp_path / "cp"))
    n = adm.processed_docs()
    # simulate a crash: orphan decision/index dirs beyond the pointer
    _docs(spark, _B1).write.mode("overwrite").parquet(
        os.path.join(adm.path, "decisions", "b=99")
    )
    assert adm.processed_docs() == n
