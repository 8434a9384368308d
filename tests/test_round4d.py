"""Differential tests for the round-4d operators (graph motifs,
temperature mixing, embedding diagnostics, streaming OHLC, decoded luma
histograms) — independent python references over real testdata."""

import math
import zlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

import __spark_entry__ as entry
from smoltable_spark.functions import multimodal
from smoltable_spark.sources.relational import load_table

MAX_ITEMS = 8


def _round_half_away(v: float) -> int:
    """Spark's round / DuckDB's round semantics (half away from zero) —
    python's round() is banker's and diverges on exactly-representable
    halves like float32 0.0625 * 1000."""
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    got = entry.queries()["rel_triangle_count"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = defaultdict(list)
    for r in li:
        orders[r["l_orderkey"]].append(r["l_partkey"])
    edges = set()
    for parts in orders.values():
        if len(parts) > MAX_ITEMS:
            continue
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = Counter()
    adj = defaultdict(set)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
        adj[u].add(v)
    tri = 0
    for u, v in edges:  # a<b<c orientation: count closed wedges at the low end
        tri += len(adj[u] & adj[v])
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert got["n_nodes"] == len(deg)
    assert got["n_edges"] == len(edges)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tri
    assert got["clustering_milli"] == (3000 * tri) // wedges if wedges else 0


def test_temperature_mix_quota_and_weights(spark, sf_dir):
    rows = entry.queries()["pipeline_temperature_mix"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in docs}
    w_milli = {
        s: math.floor(1000 * math.sqrt(math.sqrt(c)) ** 3)
        for s, c in counts.items()
    }
    sum_w, sum_n = sum(w_milli.values()), sum(counts.values())
    assert {r["source"] for r in rows} == set(counts)
    for r in rows:
        s = r["source"]
        assert r["n_docs"] == counts[s]
        assert r["weight_milli"] == w_milli[s]
        assert r["quota"] == 10_000 * w_milli[s] // sum_w
        assert r["raw_share_milli"] == 1000 * counts[s] // sum_n
    # temperature flattens: the largest source's share shrinks vs raw
    big = max(counts, key=counts.get)
    big_row = next(r for r in rows if r["source"] == big)
    if len(counts) > 1 and counts[big] > min(counts.values()):
        assert big_row["quota"] / 10_000 < big_row["raw_share_milli"] / 1000 + 1e-9


def test_cosine_hist_matches_python(spark, sf_dir):
    got = {
        r["bucket"]: r["n_pairs"]
        for r in entry.queries()["emb_cosine_hist"](spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    ref = Counter()
    for vid, vec in emb.items():
        nxt = emb.get(vid + 1)
        if nxt is None:
            continue
        qa = [_round_half_away(x * 1_000_000) for x in vec]
        qb = [_round_half_away(x * 1_000_000) for x in nxt]
        dot = sum(x * y for x, y in zip(qa, qb))
        na = math.sqrt(sum(x * x for x in qa))
        nb = math.sqrt(sum(x * x for x in qb))
        ref[math.floor(dot / (na * nb) * 20)] += 1
    assert got == dict(ref)


def test_stream_ohlc_equals_batch(spark, sf_dir):
    batch = {
        (r["event_type"], r["bucket"]): (
            r["n"], r["open_cents"], r["high_cents"], r["low_cents"], r["close_cents"]
        )
        for r in entry.queries()["rel_ohlc_bars"](spark, sf_dir).collect()
    }
    stream = {
        (r["event_type"], r["bucket"]): (
            r["n"], r["open_cents"], r["high_cents"], r["low_cents"], r["close_cents"]
        )
        for r in entry.queries()["stream_ohlc_bars"](spark, sf_dir).collect()
    }
    assert stream == batch


def test_luma_histogram_matches_generator(spark, sf_dir):
    got = defaultdict(dict)
    for r in entry.queries()["mm_luma_histogram"](spark, sf_dir).collect():
        got[r["media_id"]][r["bucket"]] = r["n_px"]
    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    ref = defaultdict(dict)
    for mid in ids:
        if mid % 3 != 0:
            continue
        w, h = 16 + mid % 64, 16 + mid % 48
        if mid % 12 in (0, 6):  # png/bmp: per-pixel generator formula
            c = Counter(((mid + j) % 256) // 32 for j in range(w * h))
        else:  # jpeg (r5): block-constant pixels, crop-weighted 8x8 blocks
            bw, bh = (w + 7) // 8, (h + 7) // 8
            c = Counter()
            for by in range(bh):
                for bx in range(bw):
                    v = (mid + by * bw + bx) % 256
                    c[v // 32] += min(8, w - 8 * bx) * min(8, h - 8 * by)
        ref[mid] = dict(c)
    assert dict(got) == dict(ref)


def test_png_roundtrip_feeds_histogram():
    # a direct (non-Spark) pin of the decode path the histogram uses
    mid, w, h = 24, 20, 10
    raw = multimodal.luma_pixels(mid, w, h)
    px = multimodal.png_decode(
        zlib.compress(
            b"".join(b"\x00" + raw[r * w : (r + 1) * w] for r in range(h))
        ),
        w,
        h,
    )
    assert px.ravel().tobytes() == raw


def test_label_margin_matches_python(spark, sf_dir):
    rows = entry.queries()["emb_label_margin"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label = defaultdict(list)
    vecs = {}
    for r in emb:
        q = [_round_half_away(x * 1000) for x in r["embedding"]]
        vecs[r["vec_id"]] = (r["label"], q)
        by_label[r["label"]].append(q)
    sums = {
        lab: [sum(col) for col in zip(*qs)] for lab, qs in by_label.items()
    }
    ns = {lab: len(qs) for lab, qs in by_label.items()}
    assert len(rows) == len(vecs)
    for r in rows:
        lab, q = vecs[r["vec_id"]]
        assert r["label"] == lab
        best = min(
            (
                (
                    sum((ns[c] * x - s) ** 2 for x, s in zip(q, sums[c]))
                    / (ns[c] * ns[c]),
                    c,
                )
                for c in sums
            ),
        )
        assert (r["nearest_label"], r["suspect"]) == (best[1], best[1] != lab)
        assert abs(r["nearest_d2"] - best[0]) < 1e-9
