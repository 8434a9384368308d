"""Distributed exact-integer linear algebra over embedding tables.

PCA-style analyses need the gram matrix G = Qᵀ Q of the (quantized)
embedding matrix. The scale-right plan is one pass of per-partition
outer products: each task computes its partial Qᵀ Q with a vectorized
int64 matmul (Arrow batch → numpy), and only dim×dim partial matrices
shuffle — never the vectors. Integer arithmetic end-to-end means the
result is independent of partitioning and batch order, which is what
makes an ITERATIVE spectral method oracle-pinnable in SQL (the same
fixed-point trick as the unrolled k-means and PageRank oracles).

Overflow budget (int64): |q| ≤ QUANT·max|x| (≈5.3e5 on the driver data);
a gram entry is ≤ n·(5.3e5)² ≈ 1.4e15 at n = 5000 — and the power
iteration rescales its vector to |v| ≤ 30 between steps, so
Σ_j G[i,j]·v[j] ≤ 64·1.4e15·30 ≈ 2.7e18 < 2⁶³. At genuinely huge n,
drop QUANT a digit (the budget is linear in n·QUANT²).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from smoltable_spark.functions.similarity import QUANT


def _quantize(col):
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, g): exact int64 gram matrix of the quantized embeddings.

    One corpus pass; per-partition Qᵀ Q via numpy int64 matmul; the
    shuffle carries dim² rows per partition. Dims are 1-based (matching
    DuckDB list indexing so oracles line up)."""

    q = emb.select(_quantize(F.col(vec_col)).alias("q"))

    def partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            m = np.array(pdf["q"].tolist(), dtype=np.int64)
            if m.size == 0:
                continue
            g = m.T @ m
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
        yield pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
        )

    partials = q.mapInPandas(partial_gram, schema="i long, j long, g long")
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


def _floordiv_expr(num: str, den: str):
    """Portable floor division for possibly-negative numerators:
    (n - pmod(n, d)) div d — subtracting the non-negative pmod makes the
    quotient exact, so Spark's truncating ``div`` and DuckDB's flooring
    ``//`` agree, and everything stays in int64 (a float ``/`` would lose
    exactness past 2⁵³)."""
    return F.expr(f"(({num}) - pmod(({num}), ({den}))) div ({den})")


def power_iteration(gram: DataFrame, iters: int = 2, vmax: int = 30) -> DataFrame:
    """(d, v): un-normalized leading-eigenvector direction after
    ``iters`` integer power steps from the all-ones vector.

    Between steps the vector is rescaled to |v| ≤ ``vmax`` with a
    max-derived divisor (data-dependent but deterministic), keeping
    every product inside int64 — see module docstring. The final
    iteration's raw integers are returned; callers wanting a unit vector
    can normalize in float afterwards."""
    v = gram.select(F.col("i").alias("d")).distinct().select(
        "d", F.lit(1).cast("long").alias("v")
    )
    for step in range(iters):
        u = (
            gram.join(v.withColumnRenamed("d", "j"), "j")
            .groupBy(F.col("i").alias("d"))
            .agg(F.sum(F.col("g") * F.col("v")).alias("u"))
        )
        if step == iters - 1:
            return u.select("d", F.col("u").alias("v"))
        s = u.agg(
            (F.expr(f"max(abs(u)) div {vmax}") + 1).alias("s")
        )
        v = u.crossJoin(F.broadcast(s)).select(
            "d", _floordiv_expr("u", "s").alias("v")
        )
    return v


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection

def jl_signs(in_dim: int, out_dim: int, seed: str = "jl") -> list[list[float]]:
    """Deterministic ±1 projection matrix from the portable md5 hash —
    R[j][i] = +1 iff md5("<seed>|<j>|<i>") is even. Seed-stable across
    engines and runs (no RNG state), so the projection is reproducible
    and SQL-expressible as literals."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest(), 16) % 2 == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    emb: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "jl",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: y = R·x/√d' with a
    seeded ±1 matrix (Achlioptas 2003 — database-friendly projections).
    Distance-preserving in expectation, so downstream ANN / clustering
    runs on d'≪d dims at a fraction of the shuffle width.

    The matrix is CONSTANT (hash-derived literals, not a broadcast): each
    output dim is one zip_with·fold over the vector — a narrow per-row
    expression at scan speed. Vectors never shuffle; fold order is index
    order in both engines, so results are bit-reproducible cross-engine.
    """
    signs = jl_signs(in_dim, out_dim, seed)
    scale = float(out_dim) ** 0.5
    cols = [F.col(id_col)]
    # malformed rows (vector length != in_dim) must project to NULL in
    # BOTH engines: Spark's zip_with null-pads the shorter side (NULL
    # poisons the fold) while DuckDB's list_sum SKIPS nulls and ignores
    # extra elements — without an explicit guard the engines diverge on
    # exactly the rows most likely to exist in dirty data
    ok = F.size(F.col(vec_col)) == in_dim
    for j in range(out_dim):
        s = F.array(*[F.lit(v) for v in signs[j]])
        y = (
            F.aggregate(
                F.zip_with(F.col(vec_col), s, lambda x, sg: x.cast("double") * sg),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.lit(scale)
        )
        cols.append(F.when(ok, y).alias(f"y{j}"))
    return emb.select(*cols)


def random_projection_sql(
    table: str,
    in_dim: int,
    out_dim: int = 8,
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
    seed: str = "jl",
) -> str:
    """DuckDB rendering of :func:`random_projection` (same literals, same
    index-order summation)."""
    signs = jl_signs(in_dim, out_dim, seed)
    scale = float(out_dim) ** 0.5
    ys = []
    for j in range(out_dim):
        lit = "[" + ", ".join(str(v) for v in signs[j]) + "]"
        ys.append(
            f"CASE WHEN len({vec_expr}) = {in_dim} THEN "
            f"list_sum(list_transform(range(1, {in_dim} + 1), "
            f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({lit})[i])) / {scale!r} "
            f"END AS y{j}"
        )
    return f"SELECT {id_expr}, {', '.join(ys)} FROM {table}"
