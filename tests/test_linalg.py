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


def test_pagerank_query_matches_python_model(spark):
    """rel_pagerank vs a direct integer-arithmetic Python model built
    from the same parquet inputs (sf0.001)."""
    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = {r["node"]: r["r"] for r in e.queries()["rel_pagerank"](spark, sf).collect()}

    con = duckdb.connect()
    pairs = con.execute(
        f"""SELECT DISTINCT 'c' || o.o_custkey, 's' || l.l_suppkey
            FROM '{sf}/orders.parquet' o
            JOIN '{sf}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: 1_000_000 for n in deg}
    for _ in range(2):
        acc = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + r[s] // deg[s]
        r = {n: 150_000 + (85 * a) // 100 for n, a in acc.items()}
    assert got == r


def test_random_projection_preserves_norms_on_average(spark):
    """JL property: E[|y|^2] = |x|^2 under the ±1/sqrt(d') matrix; check
    the empirical mean ratio over a fixture batch is within 20%, and the
    projection is deterministic."""
    import math
    import random

    from smoltable_spark.functions import linalg as L

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = L.random_projection(df, in_dim=16, out_dim=8).collect()
    assert len(out) == 60
    in_norm = {i: sum(x * x for x in v) for i, v in rows}
    ratios = []
    for r in out:
        y2 = sum(r[f"y{j}"] ** 2 for j in range(8))
        # float32 storage loses a little precision vs the python doubles
        ratios.append(y2 / in_norm[r["vec_id"]])
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
    again = L.random_projection(df, in_dim=16, out_dim=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_jl_signs_deterministic_and_balanced(spark):
    from smoltable_spark.functions import linalg as L

    a = L.jl_signs(64, 8)
    assert a == L.jl_signs(64, 8)
    flat = [v for row in a for v in row]
    assert abs(sum(flat)) < len(flat) * 0.25  # roughly balanced ±1


def test_random_projection_malformed_rows_are_null(spark):
    """Vectors whose length != in_dim must project to NULL (both engines
    agree by construction — r4 review finding: unguarded, Spark nulls
    while DuckDB partial-sums)."""
    from smoltable_spark.functions import linalg as L

    rows = [
        (1, [1.0] * 16),
        (2, [1.0] * 15),   # short
        (3, [1.0] * 17),   # long
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["y0"] for r in L.random_projection(df, in_dim=16).collect()}
    assert got[1] is not None
    assert got[2] is None and got[3] is None
