"""Deduplication operators for large-scale training-data pipelines.

Five strategies, cheapest-first, all shuffle-architected for 100 TB:

- **exact**: hash-groupBy on a fingerprint — one shuffle on a short key;
  the canonical first pass.
- **MinHash + LSH**: shingle → k seeded min-hashes → band buckets →
  candidates join within buckets only (never all-pairs), then exact
  Jaccard verification on the candidates. The join key (band_id, hash)
  is high-cardinality → well-distributed shuffle.
- **SimHash**: 16-bit signed-sum signature; near-dups share the value →
  single groupBy.
- **n-gram Jaccard (blocked)**: exact Jaccard over shingle sets, but only
  within a cheap blocking key (language) — for corpora where a natural
  block exists.
- **embedding cosine**: see ``similarity.py``; near-dup = cosine above a
  threshold within an LSH/IVF bucket.

All hashes are md5-derived (``hashing.py``) so every pipeline is
oracle-checkable cross-engine; all arithmetic is exact-integer
(quantized) so results hash identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from smoltable_spark.functions.hashing import md5_long, seeded
from smoltable_spark.functions.text import tokens, fingerprint

# ---------------------------------------------------------------------------
# exact

def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (fingerprint, keeper_id, dup_count): one row per distinct
    text, keeper = min id. ``dropDuplicates`` gives the keep-side; this
    shape also reports the duplicate count for observability.
    """
    return (
        docs.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct normalized text."""
    w_keep = exact_duplicates(docs, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return docs.join(F.broadcast(w_keep), id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles

def shingles(col, k: int = 3):
    """Distinct k-token shingles (space-joined) of a document."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Exploded (id, shingle) pairs — the input to MinHash and Jaccard."""
    return docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """(id, h0..h{n-1}): per-document MinHash signature.

    One explode + one groupBy (shuffle on id). Each hash function is a
    seeded md5 → min; k independent permutation approximations.
    """
    sh = doc_shingles(docs, text_col, id_col, k)
    aggs = [
        F.min(seeded(f"mh{i}", F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate pairs from banded LSH: docs agreeing on all rows of ≥1 band.

    Pairs are generated *within buckets only* — the self-join key is
    (band_id, band_hash), so the shuffle distributes by bucket and no
    all-pairs blow-up occurs. Output: distinct (id_a < id_b).
    """
    rows_per_band = num_hashes // bands
    buckets = None
    for b in range(bands):
        cols = [F.col(f"h{i}").cast("string") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        part = signatures.select(
            F.col(id_col),
            F.lit(b).alias("band"),
            md5_long(F.concat_ws("#", *cols)).alias("bucket"),
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    a = buckets.alias("a")
    b_ = buckets.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact Jaccard for given candidate pairs: |A∩B| / |A∪B|.

    Common-shingle counting via a shingle-join restricted to candidate
    pairs (semi-joined first so only candidate docs are exploded).
    Jaccard returned as exact rational parts (common, size_a, size_b) plus
    a double ``jaccard`` — exact parts make the threshold filter
    cross-engine exact.
    """
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = doc_shingles(
        docs.join(cand_ids, id_col, "left_semi"), text_col, id_col, k
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # common shingles: join exploded shingles of both sides through the
    # candidate pairs — shuffles on (id, shingle), never all-pairs
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
    )
    return out


def minhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → bands → candidates
    → exact-Jaccard verification. Returns verified pairs with jaccard."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, k)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    jac = jaccard_pairs(docs, cands, text_col, id_col, k)
    # exact-rational threshold: common/(a+b-common) >= t ⟺ common*den >= t_num*(...)
    num, den = int(threshold * 1000), 1000
    return jac.filter(
        F.col("common") * den
        >= num * (F.col("size_a") + F.col("size_b") - F.col("common"))
    )


def blocked_jaccard_near_duplicates(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard near-dups within a blocking key (e.g. language).

    For corpora with a natural partition; pairs only form inside blocks.
    """
    pairs = (
        docs.select(F.col(id_col).alias("id_a"), F.col(block_col).alias("blk"))
        .join(
            docs.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("blk")),
            "blk",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    jac = jaccard_pairs(docs, pairs, text_col, id_col, k)
    num, den = int(threshold * 1000), 1000
    return jac.filter(
        F.col("common") * den
        >= num * (F.col("size_a") + F.col("size_b") - F.col("common"))
    )


# ---------------------------------------------------------------------------
# SimHash

def simhash(col, bits: int = 16):
    """Signed-bit-sum SimHash over distinct tokens (exact integer math).

    bit_i(doc) = 1 iff  Σ_tokens (±1 per token's hash bit i) > 0.
    16 bits keeps the expression tree codegen-friendly; near-dups land on
    equal (or Hamming-close) values.
    """
    toks = F.array_distinct(tokens(col))

    def bit_merge(i: int):
        # closure factory (see text._marker_pred for why not a default arg)
        def merge(acc, t):
            bit = F.shiftright(md5_long(t), i).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, 1).otherwise(-1)

        return merge

    value = F.lit(0).cast("long")
    for i in range(bits):
        bit_sum = F.aggregate(toks, F.lit(0), bit_merge(i))
        value = value + F.when(bit_sum > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return value


def simhash_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Documents sharing a SimHash value (candidate near-dup clusters)."""
    return (
        docs.select(F.col(id_col), simhash(F.col(text_col), bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )
