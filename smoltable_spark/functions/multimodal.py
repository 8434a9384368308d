"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (for a 100 TB media corpus):

- media payloads live in an opaque ``binary`` column (``payload``) next to
  typed metadata (``media_type``, ``width``/``height``/``duration_ms`` …) —
  the cells model stores them as a ``bytes``-tagged family, the relational
  model as a plain column;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, zero-copy
  batches, metadata-only predicates pushed down *before* any payload
  byte moves (Parquet column pruning means a filter on ``media_type``
  never reads ``payload``);
- the actual codec calls are STUBBED here (image/audio libraries are not
  in this container): ``decode_stub=True`` produces deterministic fake
  features, and ``decode_stub=False`` raises ``NotImplementedError`` at
  the point a real codec would be invoked. The Spark-side plumbing —
  schema, batching, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from the documents corpus —
    exercises the binary-column plumbing with real (content-derived) bytes."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.length(F.col(text_col)) * 10).cast("long").alias("duration_ms"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: bytes of the
    sha256 digest scaled to [0,1). Replace with a real codec in prod."""
    dig = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in dig[:dim]]


def extract_features(
    media: DataFrame, decode_stub: bool = True, dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` processes whole Arrow batches per worker — the 100 TB
    shape: payloads never leave the executor, only the (tiny) feature
    vectors shuffle. With ``decode_stub=False`` this is where a real
    image/audio decode would run; the container has no codec libs, so it
    raises ``NotImplementedError`` (clearly marked stub, by design).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; use decode_stub=True"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_sha": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": [_fake_feature(p, dim) for p in pdf["payload"]],
                }
            )
            yield out

    from smoltable_spark.functions.dedup import spread

    # cap Python-worker fan-out: each mapInPandas partition pays worker
    # startup + Arrow setup, so small inputs want few fat partitions while
    # 100 TB inputs arrive pre-partitioned (spread is then a no-op)
    target = min(media.sparkSession.sparkContext.defaultParallelism, 8)
    return spread(media, target).mapInPandas(run, FEATURES_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched resize: same schema out, payload re-encoded at the
    target dimensions. Stubbed transform = deterministic passthrough with
    a dimension-stamped header so tests can verify the batch path end to
    end; ``decode_stub=False`` marks where a real image library resizes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires image libraries not present in "
                    "this environment; use decode_stub=True"
                )
            header = f"resized:{width}x{height}:".encode()
            pdf = pdf.copy()
            pdf["payload"] = [header + (p or b"") for p in pdf["payload"]]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    from smoltable_spark.functions.dedup import spread

    target = min(media.sparkSession.sparkContext.defaultParallelism, 8)
    return spread(media, target).mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: one output row per frame to extract.

    Pure JVM-side (sequence + explode) — the expensive decode happens
    later in ``extract_features`` per planned frame. Planning frames
    relationally first lets Catalyst prune/limit before any decode.
    """
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return media.filter(F.col("media_type") == "video").select(
        "media_id", F.explode(frames).alias("frame_ms")
    )
