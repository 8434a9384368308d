"""Bounded-space streaming sketches for heavy-hitter discovery.

The reference keeps approximate statistics per table (row-count
heuristics, segment counts — smoltable/src/table/mod.rs); this module
extends that idea to the sketch a 100 TB text pipeline actually needs:
frequent-item (heavy-hitter) discovery over token/shingle streams whose
distinct-item cardinality dwarfs executor memory.

Why not ``groupBy(token).count()`` first? Because that shuffles EVERY
distinct token — at 100 TB the token stream is trillions of rows and the
shuffle is the job. The Misra-Gries two-phase plan shuffles only
candidate tokens:

phase 1 (map-side, bounded space): each partition streams its tokens
    through a Misra-Gries summary with ``k`` counters — O(k) memory no
    matter how many tokens or distinct tokens the partition holds. MG
    guarantees every item with partition-local frequency > n_p/(k+1)
    survives the partition's summary.
phase 2 (exact verify): the per-partition survivors (≤ k rows per
    partition, a tiny fraction of the stream) are unioned, deduped, and
    broadcast back; one more map-side pass counts ONLY candidate tokens
    exactly, and a final filter keeps counts ≥ ceil(threshold · N).

Correctness (pigeonhole): if an item's global frequency is ≥ θ·N, then
in at least one partition its local frequency is ≥ θ·n_p (otherwise the
global sum would be < θ·N). With k ≥ 1/θ counters, θ·n_p > n_p/(k+1),
so the item survives that partition's MG summary and reaches phase 2.
Phase 2 counts are exact, so the final result is EXACTLY the θ-heavy
set with exact counts — the sketch only prunes the candidate space, it
never decides membership. A plain ``GROUP BY ... HAVING count >= θN``
oracle therefore pins this bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _mg_add(counters: dict, tok: str, c: int, k: int) -> None:
    """Weighted Misra-Gries step: fold ``c`` occurrences of ``tok`` in,
    then restore the k-counter bound by subtracting the minimum counter
    from everything (the weighted form of MG's decrement-all; every
    subtraction removes at least one counter and charges ≤ m·(k+1) mass,
    preserving the N/(k+1) undercount bound and hence the superset
    guarantee)."""
    counters[tok] = counters.get(tok, 0) + c
    if len(counters) > k:
        m = min(counters.values())
        drop = [t for t, v in counters.items() if v <= m]
        for t in drop:
            del counters[t]
        for t in counters:
            counters[t] -= m


def mg_candidates(tokens_df: DataFrame, k: int, token_col: str = "tok") -> DataFrame:
    """Phase 1: per-partition Misra-Gries survivors (distinct tokens).

    ``tokens_df`` is one token per row; the summary accumulates across
    all Arrow batches of a partition (mapInPandas hands the whole
    partition to one function call as a batch iterator), so memory is
    O(k) per task regardless of partition size. Each batch is first
    collapsed by ``value_counts`` (vectorized C path) so the Python loop
    touches unique tokens per batch, not raw occurrences."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for tok, c in pdf[token_col].value_counts().items():
                _mg_add(counters, tok, int(c), k)
        yield pd.DataFrame({token_col: list(counters.keys())})

    return tokens_df.mapInPandas(summarize, schema=f"{token_col} string").distinct()


def heavy_hitters(
    tokens_df: DataFrame,
    threshold: float,
    token_col: str = "tok",
    k: int | None = None,
) -> DataFrame:
    """EXACT θ-heavy-hitters (count ≥ ceil(θ·N)) via MG candidate pruning.

    Returns (token, cnt) with exact counts. ``k`` defaults to ceil(1/θ),
    the smallest summary that preserves the superset guarantee (see
    module docstring); pass a larger ``k`` to shrink the candidate set
    further at the cost of sketch memory.
    """
    if not (0 < threshold < 1):
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if k is None:
        k = math.ceil(1 / threshold)
    elif k < math.ceil(1 / threshold):
        raise ValueError(
            f"k={k} breaks the MG superset guarantee for threshold={threshold}"
            f" (needs k >= {math.ceil(1 / threshold)})"
        )
    cand = mg_candidates(tokens_df, k=k, token_col=token_col)
    total = tokens_df.count()
    cutoff = math.ceil(threshold * total)
    # broadcast semi-join: non-candidate tokens are dropped MAP-SIDE, so
    # the exact-count shuffle carries only candidate rows (≤ k × n_parts
    # distinct keys)
    return (
        tokens_df.join(F.broadcast(cand), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= cutoff)
    )
