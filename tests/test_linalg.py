"""Exact-integer gram + power iteration vs a numpy int64 reference."""

import numpy as np

from smoltable_spark.functions import linalg
from smoltable_spark.functions.similarity import QUANT


def _ref_power(mat_q, iters=2, vmax=30):
    g = mat_q.T @ mat_q
    v = np.ones(g.shape[0], dtype=np.int64)
    for step in range(iters):
        u = g @ v
        if step == iters - 1:
            return u
        s = np.abs(u).max() // vmax + 1
        v = (u - np.mod(u, s)) // s  # np.mod is non-negative for s>0, like pmod
    return v


def test_gram_and_power_match_numpy(spark):
    rng = np.random.default_rng(7)
    mat = rng.uniform(-0.5, 0.5, size=(40, 6))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(5)

    q = np.round(mat * QUANT).astype(np.int64)
    gram = linalg.gram_matrix(df)
    got_g = {(r["i"], r["j"]): r["g"] for r in gram.collect()}
    ref_g = q.T @ q
    assert got_g == {
        (i + 1, j + 1): int(ref_g[i, j]) for i in range(6) for j in range(6)
    }

    got_v = {r["d"]: r["v"] for r in linalg.power_iteration(gram, iters=2).collect()}
    ref_v = _ref_power(q)
    assert got_v == {d + 1: int(ref_v[d]) for d in range(6)}
