"""Streaming near-duplicate admission — the crawl loop as a stream.

``functions/dedup_incremental.py`` admits ONE batch against a persisted
corpus LSH index. This module closes the loop: a Structured Streaming
``foreachBatch`` sink where every micro-batch of documents is

1. admitted against the index state left by all PRIOR batches
   (``minhash_dedup_incremental`` — skinny band-bucket candidate joins,
   exact-Jaccard verify on survivors),
2. its admit/reject decisions appended to a versioned decisions log,
3. the ADMITTED documents' index rows (shingle-hash set + banded
   buckets, built once per batch) appended to the index,

so the corpus index is the ONLY cross-batch state — no Spark streaming
state store, no watermark horizon, and the index survives restarts by
construction. ``dropDuplicatesWithinWatermark`` can express exact
streaming dedup (streaming/ingest.py::dedup_events_stream) but not
near-dup admission: candidate generation needs a similarity join
against everything ever admitted, which is exactly what the persisted
index serves in O(matched buckets) per batch.

Exactly-once: the same meta/commit discipline as
``store_cdc.StoreChangeRollup`` — decisions and index rows land under
``b=<batch_id>`` dirs BEFORE the meta pointer moves (crash replay
overwrites them idempotently), batch ids are bound to one checkpoint
generation, and replayed batches are skipped.

The reference engine has no dedup surface (its scope ends at the cell
store — smoltable/src/table/mod.rs); this extends the LLM-pipeline
family's steady-state story: a 100 TB crawl ingests forever, and
per-trigger cost stays O(batch + matched buckets) while the index
grows with the ADMITTED corpus only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from smoltable_spark.sources.store_fs import publish_text, store_fs_for

from smoltable_spark.functions.dedup_incremental import (
    lsh_index,
    minhash_dedup_incremental,
)


class MinhashAdmitter:
    """Persisted admit state + the ``foreachBatch`` hook.

    Layout under ``path``:

    - ``_META`` — ``{last_batch_id, checkpoint}`` (atomic rename commit);
    - ``index/b=<n>/`` — LSH rows of the docs batch ``n`` admitted;
    - ``decisions/b=<n>/`` — the batch's full admit/reject record
      (one row per input doc: ``doc_id, sz, corpus_dup, batch_dup,
      admitted, batch_no``).
    """

    _META = "_META"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
        num_hashes: int = 16,
        bands: int = 4,
        k: int = 3,
        max_bucket_df: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.max_bucket_df = max_bucket_df
        # round 11: the admitter's state (meta + LSH index + decision
        # legs) is the persisted dedup index — at scale it lives on
        # object storage, so metadata ops dispatch on the path scheme
        # like CellStore's (sources/store_fs.py)
        self._fs = store_fs_for(spark, path)
        self._fs.makedirs(path)

    # -- meta (same commit discipline as store_cdc.StoreChangeRollup) ------

    def _meta(self) -> dict:
        p = os.path.join(self.path, self._META)
        if not self._fs.exists(p):
            return {"last_batch_id": -1}
        return json.loads(self._fs.read_text(p))

    def _commit_meta(self, meta: dict) -> None:
        # atomic publish: the admitter's commit point (capability-
        # dispatched like the store pointer — see store_fs.publish_text)
        publish_text(
            self._fs, os.path.join(self.path, self._META), json.dumps(meta)
        )

    def bind_checkpoint(self, checkpoint_dir: str) -> None:
        """foreachBatch batch ids are monotone only WITHIN one checkpoint
        generation (store_cdc round-8 finding): a fresh checkpoint
        renumbers from 0 and the replay skip would swallow real batches.
        Bind on first use; fail loudly on a different or rebuilt one."""
        meta = self._meta()
        is_uri = "://" in checkpoint_dir
        cp = checkpoint_dir if is_uri else os.path.abspath(checkpoint_dir)
        bound = meta.get("checkpoint")
        folded = meta.get("last_batch_id", -1) >= 0
        if bound is None:
            if folded:
                raise ValueError(
                    f"admitter at {self.path} has folded batches but no "
                    "recorded checkpoint binding; whether this checkpoint "
                    "produced its batch ids cannot be verified — rebuild "
                    "the admitter together with the checkpoint"
                )
            self._commit_meta({**meta, "checkpoint": cp})
            return
        if bound != cp:
            raise ValueError(
                f"admitter at {self.path} is bound to checkpoint {bound}; "
                f"starting it with {cp} would replay batch ids from 0 — "
                "rebuild the admitter together with the new checkpoint"
            )
        if folded and not is_uri and not os.path.isdir(cp):
            raise ValueError(
                f"admitter at {self.path} has folded batches from "
                f"checkpoint {cp}, but that checkpoint no longer exists — "
                "rebuild the admitter too"
            )

    # -- persisted state ---------------------------------------------------

    def _batch_dirs(self, sub: str) -> list[str]:
        root = os.path.join(self.path, sub)
        if not self._fs.isdir(root):
            return []
        last = self._meta()["last_batch_id"]
        return [
            os.path.join(root, d)
            for d in sorted(
                self._fs.listdir(root), key=lambda s: int(s.split("=", 1)[1])
            )
            if d.startswith("b=") and int(d.split("=", 1)[1]) <= last
        ]

    def index(self) -> DataFrame | None:
        """The corpus LSH index: one row per ADMITTED doc across all
        committed batches (None before the first commit). Uncommitted
        ``b=`` dirs from a crashed batch are excluded — the meta pointer
        is the truth."""
        dirs = self._batch_dirs("index")
        if not dirs:
            return None
        return self.spark.read.option("basePath", os.path.join(self.path, "index")).parquet(*dirs)

    def decisions(self) -> DataFrame | None:
        """Full admit/reject log across committed batches."""
        dirs = self._batch_dirs("decisions")
        if not dirs:
            return None
        return self.spark.read.option(
            "basePath", os.path.join(self.path, "decisions")
        ).parquet(*dirs)

    # -- the foreachBatch hook ---------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        meta = self._meta()
        if batch_id <= meta["last_batch_id"]:
            return  # crash replay of a committed batch: idempotent skip
        if batch_df.isEmpty():
            self._commit_meta({**meta, "last_batch_id": batch_id})
            return
        # one shingle pass per batch: the batch index feeds BOTH the
        # admit decision and the rows appended for admitted docs
        bidx = lsh_index(
            batch_df, self.text_col, self.id_col, self.num_hashes,
            self.bands, self.k,
        ).localCheckpoint(eager=True)
        idx = self.index()
        if idx is None:
            idx = bidx.limit(0)  # empty index, same frozen hash family
        res = minhash_dedup_incremental(
            idx,
            batch_df,
            self.text_col,
            self.id_col,
            self.threshold,
            self.num_hashes,
            self.bands,
            self.k,
            self.max_bucket_df,
            batch_index=bidx,
        ).withColumn("batch_no", F.lit(batch_id).cast("int"))
        res = res.localCheckpoint(eager=True)  # decisions + admit filter
        res.write.mode("overwrite").parquet(
            os.path.join(self.path, "decisions", f"b={batch_id}")
        )
        admitted = res.filter(F.col("admitted") == 1).select(self.id_col)
        bidx.join(admitted, self.id_col).write.mode("overwrite").parquet(
            os.path.join(self.path, "index", f"b={batch_id}")
        )
        self._commit_meta({**meta, "last_batch_id": batch_id})

    def processed_docs(self) -> int:
        d = self.decisions()
        return 0 if d is None else d.count()


def minhash_admit_stream(
    docs_stream: DataFrame,
    admitter: MinhashAdmitter,
    checkpoint_dir: str,
):
    """Wire a streaming documents source into the admitter; returns the
    DataStreamWriter (caller picks the trigger — ``availableNow`` for
    catch-up replay, processing-time for live tailing)."""
    admitter.bind_checkpoint(checkpoint_dir)
    return (
        docs_stream.writeStream.foreachBatch(admitter.process_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
