"""Training-data extension tests: text analysis, dedup, similarity,
multimodal plumbing."""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from smoltable_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 1
        (3, "completely different content about spark engines", "en"),
        (4, "der schnelle braune fuchs springt", "de"),
        (5, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")


def test_token_counts(spark, docs):
    out = docs.select("doc_id", text.token_count(F.col("text")).alias("n")).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    assert got[1] == 9 and got[4] == 5


def test_tokens_collapse_empty(spark):
    df = spark.createDataFrame([("a  b   c",)], "text STRING")
    assert df.select(text.token_count(F.col("text")).alias("n")).collect()[0]["n"] == 3


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("  Hello World ",), ("hello world",)], "text STRING")
    fps = [r[0] for r in df.select(text.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_exact_dedup(spark, docs):
    kept = dedup.dedup_exact(docs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2, 3, 4]  # doc 5 deduped into doc 1


def test_exact_duplicate_groups(spark, docs):
    groups = dedup.exact_duplicates(docs).filter(F.col("dup_count") > 1).collect()
    assert len(groups) == 1
    assert groups[0]["keeper_id"] == 1 and groups[0]["dup_count"] == 2


def test_minhash_finds_near_dups(spark, docs):
    out = dedup.minhash_near_duplicates(docs, num_hashes=16, bands=8, k=2, threshold=0.3)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 5) in pairs  # exact dup always survives
    assert (1, 2) in pairs or (2, 5) in pairs  # near-dup caught


def test_jaccard_exact_values(spark, docs):
    pairs = spark.createDataFrame([(1, 5)], "id_a LONG, id_b LONG")
    out = dedup.jaccard_pairs(docs, pairs, k=3).collect()[0]
    assert out["jaccard"] == 1.0 and out["common"] == out["size_a"]


def test_simhash_identical_for_dups(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash_df(docs).collect()}
    assert sh[1] == sh[5]
    assert 0 <= sh[1] < 2**60  # 60-bit signatures, non-negative BIGINT


def test_blocked_jaccard_respects_blocks(spark, docs):
    out = dedup.blocked_jaccard_near_duplicates(docs, block_col="lang", threshold=0.1)
    for r in out.collect():
        assert r["id_a"] != 4 and r["id_b"] != 4  # 'de' block has one doc


def test_blocked_jaccard_size_buckets_lose_no_pairs(spark, docs):
    """The (block, size-bucket) candidate pruning must return exactly the
    brute-force within-block threshold answer — including pairs whose
    shingle counts straddle a power-of-two bucket boundary."""
    from itertools import combinations

    rows = [(r["doc_id"], r["lang"], r["text"]) for r in docs.collect()]
    # straddle floor(log2): 4-shingle vs 8-shingle docs, J = 4/8 = 0.5
    base = "w0 w1 w2 w3 w4 w5"          # 4 distinct 3-shingles
    ext = base + " w6 w7 w8 w9"          # 8 distinct 3-shingles, superset
    rows += [(100, "xx", base), (101, "xx", ext)]
    docs2 = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def brute(th):
        sh = {
            r["doc_id"]: (r["lang"], set(r["sh_arr"]))
            for r in dedup.shingle_arrays(docs2, k=3)
            .join(docs2.select("doc_id", "lang"), "doc_id")
            .select("doc_id", "lang", "sh_arr")
            .collect()
        }
        out = set()
        for a, b in combinations(sorted(sh), 2):
            (la, sa), (lb, sb) = sh[a], sh[b]
            if la != lb:
                continue
            common = len(sa & sb)
            if common * 1000 >= int(th * 1000) * (len(sa) + len(sb) - common):
                out.add((a, b))
        return out

    for th in (0.5, 0.3):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.blocked_jaccard_near_duplicates(
                docs2, block_col="lang", threshold=th
            ).collect()
        }
        assert got == brute(th), th
    assert (100, 101) in brute(0.5)  # the boundary pair is actually a dup


def test_benchmark_contamination_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over the lazy dog suffix"),
            (2, "completely different content with no overlap at all here okay"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in dedup.benchmark_contamination(train, bench, k=8).collect()
    }
    assert 1 in got and got[1] >= 1  # contains the benchmark 8-gram(s)
    assert 2 not in got              # clean doc unflagged


def test_blocked_jaccard_block_size_guard(spark, docs):
    import pytest

    with pytest.raises(ValueError, match="max_block_rows"):
        dedup.blocked_jaccard_near_duplicates(
            docs, block_col="lang", threshold=0.5, max_block_rows=1
        )


@pytest.fixture(scope="module")
def vectors(spark):
    # dims 1-2 strictly nonzero: srp_bucket uses sign(>0), so a 0.0 dim
    # would land a vector in a different bucket than its near-neighbors
    rows = [
        (0, [1.0, 0.1, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),    # close to 0
        (2, [-0.1, 1.0, 0.0, 0.0]),   # near-orthogonal to 0
        (3, [-1.0, -0.1, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_bruteforce_topk_order(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = similarity.cosine_topk_bruteforce(vectors, q, k=4).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order[0] == 1  # most similar
    assert order[-1] == 3  # opposite vector last
    top = [r for r in out if r["rank"] == 1][0]
    expect = (0.9 + 0.01) / (math.sqrt(1.01) * math.sqrt(0.82))
    assert math.isclose(top["cosine"], expect, rel_tol=1e-5)


def test_bucketed_restricts_candidates(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = similarity.cosine_topk_bucketed(vectors, q, k=4, bucket_dims=[1, 2])
    neigh = {r["neighbor_id"] for r in out.collect()}
    assert 3 not in neigh  # opposite sign on dim 1 -> different bucket
    assert 1 in neigh


def test_embedding_near_duplicates(spark, vectors):
    out = similarity.embedding_near_duplicates(vectors, threshold=0.9, bucket_dims=[1, 2])
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)


def test_multimodal_features_roundtrip(spark, docs):
    media = multimodal.synthesize_media(docs)
    feats = multimodal.extract_features(media, decode_stub=True).collect()
    assert len(feats) == 5
    for r in feats:
        assert len(r["payload_sha"]) == 64
        assert len(r["feature"]) == 8
        assert all(0 <= x < 1 for x in r["feature"])


def test_multimodal_all_formats_decode_for_real(spark, docs):
    # round-5: the JPEG scan decoder retired the last stub — every image
    # (png/bmp/jpeg) now yields a real decoded mean_luma, with or without
    # the legacy decode_stub flag
    media = multimodal.synthesize_media(docs)
    feats = multimodal.extract_features(media, decode_stub=False).collect()
    for r in feats:
        if r["media_type"] == "image":
            assert r["mean_luma"] is not None, r["container"]


def test_frame_plan_only_videos(spark, docs):
    media = multimodal.synthesize_media(docs)
    plan = multimodal.frame_sample_plan(media, every_ms=100).collect()
    vids = {r["media_id"] for r in plan}
    assert vids == {2, 5}  # doc_id % 3 == 2 -> video
    frames = sorted(r["frame_ms"] for r in plan if r["media_id"] == 2)
    assert frames[0] == 0 and frames[1] == 100


def test_lang_id_deterministic(spark):
    df = spark.createDataFrame(
        [("the fast scan and the table",), ("der schnelle und table merge",)],
        "text STRING",
    )
    out = [r[0] for r in df.select(text.lang_id(F.col("text"))).collect()]
    assert out[0] == "en" and out[1] == "de"


def test_quality_score_range(spark, docs):
    out = docs.select(text.quality_score(F.col("text")).alias("q")).collect()
    for r in out:
        assert 0 <= r["q"] <= 100


def test_bpe_pieces_and_stopwords(spark):
    from smoltable_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("The cat, and 42 dogs!",), ("",)], "text string"
    )
    out = df.select(
        T.bpe_pieces(F.col("text")).alias("p"),
        T.stopword_permille(F.col("text")).alias("sp"),
    ).collect()
    # "the","cat",",","and","42","dogs","!" → 7 pieces
    assert out[0]["p"] == ["the", "cat", ",", "and", "42", "dogs", "!"]
    # tokens: the cat, and 42 dogs! → 5 whitespace tokens; stopwords: the, and → 2/5
    assert out[0]["sp"] == 400
    assert out[1]["p"] == [] and out[1]["sp"] == 0


def test_ivf_topk_matches_bruteforce_when_probing_all(spark):
    """nprobe = n_centroids → IVF candidates = whole corpus → exact."""
    import random
    from smoltable_spark.functions import similarity as S

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter("vec_id < 3")
    exact = S.cosine_topk_bruteforce(emb, queries, k=5)
    ivf = S.cosine_topk_ivf(emb, queries, k=5, n_centroids=4, nprobe=4)
    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in df.collect()
    )
    assert key(ivf) == key(exact)


def test_ivf_restricts_candidates(spark):
    """nprobe=1 searches only the query's own list — results are a subset
    of each probed list, never the full corpus."""
    import random
    from smoltable_spark.functions import similarity as S

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter("vec_id < 2")
    out = S.cosine_topk_ivf(emb, queries, k=40, n_centroids=4, nprobe=1)
    per_query = {}
    for r in out.collect():
        per_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, neighbors in per_query.items():
        assert len(neighbors) < 39  # strictly fewer than all-minus-self


def test_salted_join_matches_plain_join(spark):
    from smoltable_spark.functions.skew import salted_join
    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(20)],
        "k string, v long",
    )
    small = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
    plain = big.join(small, "k")
    salted = salted_join(big, small, on="k", salt=4)
    assert salted.count() == plain.count() == 520
    ps = plain.agg(F.sum("v"), F.sum("w")).collect()[0]
    ss = salted.agg(F.sum("v"), F.sum("w")).collect()[0]
    assert tuple(ps) == tuple(ss)


def test_multiprobe_recall_at_least_single_probe(spark, vectors):
    """Multi-probe candidates are a superset of single-probe candidates
    (same bucket + Hamming-1 flips), so per-query result cosines at each
    rank must be >= the single-probe ones."""
    from smoltable_spark.functions import similarity

    qs = vectors.filter("vec_id = 0")
    single = {
        (r["rank"]): r["cosine"]
        for r in similarity.cosine_topk_bucketed(
            vectors, qs, k=3, bucket_dims=[1, 2], multiprobe=False
        ).collect()
    }
    multi = {
        (r["rank"]): r["cosine"]
        for r in similarity.cosine_topk_bucketed(
            vectors, qs, k=3, bucket_dims=[1, 2], multiprobe=True
        ).collect()
    }
    assert len(multi) >= len(single)
    for rank, cos in single.items():
        assert multi[rank] >= cos - 1e-12


def test_ivf_index_persist_and_query(spark, vectors, tmp_path):
    """Persisted IVF index returns exactly what the in-memory IVF search
    returns with the same centroids, and the probe read carries a
    list_id partition filter (only probed list dirs are scanned)."""
    from smoltable_spark.functions import similarity
    from smoltable_spark import plans

    path = str(tmp_path / "ivf_index")
    cents = similarity.kmeans_centroids(vectors, n_centroids=2, iters=1)
    similarity.build_ivf_index(vectors, path, centroids=cents)
    qs = vectors.filter("vec_id = 0")
    served = similarity.query_ivf_index(spark, path, qs, k=3, nprobe=1)
    direct = similarity.cosine_topk_ivf(
        vectors, qs, k=3, nprobe=1, centroids=cents
    )
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, direct.collect()))
    assert any("list_id" in f for f in plans.audit(served)["partition_filters"])


def test_kmeans_centroids_deterministic_and_consumable(spark, vectors):
    from smoltable_spark.functions import similarity

    a = {
        r["cid"]: (tuple(r["cq"]), r["cn2"])
        for r in similarity.kmeans_centroids(vectors, n_centroids=2, iters=2).collect()
    }
    b = {
        r["cid"]: (tuple(r["cq"]), r["cn2"])
        for r in similarity.kmeans_centroids(vectors, n_centroids=2, iters=2).collect()
    }
    assert a == b and 1 <= len(a) <= 2  # deterministic; degeneracy may drop lists
    for cq, cn2 in a.values():
        assert cn2 == sum(x * x for x in cq)  # exact integer norm invariant
    # trained centroids slot into the IVF search and return ranked neighbors
    out = similarity.cosine_topk_ivf(
        vectors,
        vectors.filter("vec_id = 0"),
        k=3,
        nprobe=1,
        centroids=similarity.kmeans_centroids(vectors, n_centroids=2, iters=1),
    ).collect()
    assert len(out) >= 1 and all(r["query_id"] == 0 for r in out)


def test_kmeans_sample_mod_trains_on_subset(spark, vectors):
    """sample_mod trains on the deterministic hash-subsample — still
    returns usable centroids (possibly fewer than n_centroids)."""
    from smoltable_spark.functions import similarity

    cents = similarity.kmeans_centroids(
        vectors, n_centroids=2, iters=1, sample_mod=2
    ).collect()
    assert 1 <= len(cents) <= 2
    for r in cents:
        assert r["cn2"] == sum(x * x for x in r["cq"])


def test_salted_join_rejects_small_side_preserving_how(spark):
    """ADVICE r1: the small side exists salt× under salting, so right/full
    joins would emit unmatched small-side rows once per replica — refuse."""
    import pytest
    from smoltable_spark.functions.skew import salted_join

    big = spark.createDataFrame([("a", 1)], "k string, v long")
    small = spark.createDataFrame([("a", 1.0), ("orphan", 2.0)], "k string, w double")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, on="k", salt=4, how=how)
    # left (big-preserving) stays exact: unmatched BIG rows appear once
    bigger = spark.createDataFrame([("a", 1), ("nomatch", 2)], "k string, v long")
    left = salted_join(bigger, small, on="k", salt=4, how="left")
    assert left.count() == 2


def test_two_phase_agg_exact(spark):
    from smoltable_spark.functions.skew import two_phase_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(5)],
        "k string, v long",
    )
    out = two_phase_agg(
        df, "k",
        {"n": ("count", F.lit(1)), "total": ("sum", F.col("v")), "mx": ("max", F.col("v"))},
        salt=8,
    )
    got = {r["k"]: (r["n"], r["total"], r["mx"]) for r in out.collect()}
    assert got == {"a": (100, 4950, 99), "b": (5, 10, 4)}


def test_resize_media_real(spark, docs):
    """Round-5: resize is REAL — images decode, nearest-neighbor resample,
    and re-encode in their own container at the new dims; non-images pass
    through untouched."""
    import numpy as np
    from smoltable_spark.functions import multimodal as M

    media = M.synthesize_media(docs)
    before = {r["media_id"]: r for r in media.collect()}
    out = M.resize_media(media, 32, 24)
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in media.schema
    ]
    rows = {r["media_id"]: r for r in out.collect()}

    def model_resample(px, h0, w0):
        iy = (np.arange(24, dtype=np.int64) * h0) // 24
        ix = (np.arange(32, dtype=np.int64) * w0) // 32
        return px.reshape(h0, w0)[iy][:, ix]

    for mid, r in rows.items():
        if r["media_type"] != "image":  # audio/video: byte-identical
            assert bytes(r["payload"]) == bytes(before[mid]["payload"])
            assert (r["width"], r["height"]) == (
                before[mid]["width"], before[mid]["height"]
            )
            continue
        assert (r["width"], r["height"]) == (32, 24)
        info = M.parse_container(bytes(r["payload"]))
        assert (info["width"], info["height"]) == (32, 24)
        w0, h0 = 16 + mid % 64, 16 + mid % 48
        if info["container"] in ("png", "bmp"):
            src = np.frombuffer(M.luma_pixels(mid, w0, h0), dtype=np.uint8)
            expect = model_resample(src, h0, w0)
            if info["container"] == "png":
                got = M.png_decode(info["idat"], 32, 24)
                # tEXt content (the document text) survives the re-encode
                assert info["content"] == M.parse_container(
                    bytes(before[mid]["payload"])
                )["content"]
            else:
                got = np.frombuffer(info["content"], dtype=np.uint8)[::3].reshape(24, 32)
            assert (got == expect).all()
        else:  # jpeg: DC-only source decodes exactly; re-encode is +/-1
            bv = M.jpeg_block_values(mid, w0, h0)
            src = np.repeat(np.repeat(bv, 8, 0), 8, 1)[:h0, :w0]
            expect = model_resample(src.ravel(), h0, w0)
            got = M.jpeg_decode(info)
            assert np.abs(got.astype(int) - expect.astype(int)).max() <= 1
            # COM content (the document text) survives the re-encode
            assert info["content"] == M.parse_container(
                bytes(before[mid]["payload"])
            )["content"]


def test_hashed_embedding_fast_path_matches_expression(spark, docs):
    from smoltable_spark.functions import text as T
    from pyspark.sql import functions as F

    slow = docs.select("doc_id", T.hashed_embedding(F.col("text"), dim=8).alias("e"))
    fast = T.hashed_embedding_df(docs, dim=8).withColumnRenamed("embedding", "e")
    s = {r["doc_id"]: r["e"] for r in slow.collect()}
    f_ = {r["doc_id"]: r["e"] for r in fast.collect()}
    assert s == f_
    # embeddings are nonzero for non-empty docs
    assert any(any(v != 0 for v in e) for e in f_.values())


def test_chunk_duplicates_finds_shared_spans(spark):
    rows = [
        (1, "a b c d e f g h i j K1 K2"),       # chunk1 'a..j' shared with doc 2
        (2, "a b c d e f g h i j X9 X8"),
        (3, "totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.chunk_duplicates(df, k=10, min_docs=2).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["example_doc_id"] == 1


def test_paragraph_duplicates_separator(spark):
    rows = [
        (1, "all rights reserved worldwide. unique text one here"),
        (2, "all rights reserved worldwide. unique text two there"),
        (3, "nothing shared with others. at all in this doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.paragraph_duplicates(df, sep=". ", min_docs=2, min_tokens=3).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2


def test_minhash_fast_hash_finds_exact_dups(spark, docs):
    """xxhash64 production path: exact duplicates have identical signatures
    under ANY hash family → always candidates → always verified."""
    out = dedup.minhash_near_duplicates(
        docs, num_hashes=16, bands=8, k=2, threshold=0.3, fast_hash=True
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 5) in pairs


def test_cluster_pairs_transitive(spark):
    """Chains resolve transitively within the round budget: 1-2, 2-3, 3-4
    → one cluster labeled by the min member."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in dedup.cluster_pairs(pairs, rounds=4).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    summary = {r["cluster_id"]: r["n_docs"] for r in dedup.cluster_summary(pairs, rounds=4).collect()}
    assert summary == {1: 4, 10: 2}


def _union_find_components(edges):
    """Reference labeling: classic union-find, label = component min."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        r = find(n)
        roots.setdefault(r, []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


def test_cluster_pairs_cc_long_path(spark):
    """A 40-node path has diameter 39 — far past any fixed round budget.
    Large-star/small-star must still resolve it to ONE component, proving
    the convergence loop (not the round count) is what terminates."""
    edges = [(i, i + 1) for i in range(1, 40)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = {
        r["doc_id"]: r["cluster_id"] for r in dedup.cluster_pairs_cc(pairs).collect()
    }
    assert labels == {n: 1 for n in range(1, 41)}


def test_cluster_pairs_cc_matches_union_find(spark):
    """Differential test vs driver-side union-find on a mixed graph:
    a path, a star, a triangle with a tail, and isolated pairs."""
    edges = (
        [(i, i + 1) for i in range(100, 110)]      # path
        + [(200, t) for t in range(201, 208)]      # star
        + [(300, 301), (301, 302), (302, 300), (302, 303), (303, 304)]
        + [(400, 401), (500, 501)]
        + [(100, 100)]                             # self-loop must be inert
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    want = _union_find_components([(a, b) for a, b in edges if a != b])
    want[100] = min(want.get(100, 100), 100)
    got = {
        r["doc_id"]: r["cluster_id"] for r in dedup.cluster_pairs_cc(pairs).collect()
    }
    assert got == want
    sizes = {
        r["cluster_id"]: r["n_docs"] for r in dedup.cluster_summary_cc(pairs).collect()
    }
    assert sizes == {100: 11, 200: 8, 300: 5, 400: 2, 500: 2}


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None)
def test_cluster_pairs_cc_random_graphs(spark, edges):
    """Hypothesis: on arbitrary small graphs the distributed CC labels
    equal union-find's component minima exactly."""
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "id_a long, id_b long"
    )
    eff = [(a, b) for a, b in (edges or [(0, 0)])]
    want = _union_find_components([(a, b) for a, b in eff if a != b])
    for a, b in eff:  # self-loops still register the node
        want.setdefault(a, a)
        want.setdefault(b, b)
    got = {
        r["doc_id"]: r["cluster_id"] for r in dedup.cluster_pairs_cc(pairs).collect()
    }
    assert got == want


def test_simhash_banded_equals_bruteforce(spark, docs):
    """Pigeonhole exhaustiveness: banded candidates + Hamming filter must
    equal all-pairs brute force for max_distance < bands."""
    from itertools import combinations

    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_df(docs).collect()}
    want = {
        (a, b)
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_duplicates(docs, bands=4, max_distance=3).collect()
    }
    assert got == want and (1, 5) in got  # exact dups at distance 0


def test_container_roundtrip_pure():
    """PNG/JPEG/WAV builders and parse_container round-trip dims,
    duration, and content exactly (pure Python — no Spark)."""
    from smoltable_spark.functions import multimodal as M

    content = ("ünïcode content " * 5000).encode()  # multi-COM JPEG path
    for payload, expect in [
        (M.png_bytes(37, 21, content), ("png", 37, 21, None)),
        (M.jpeg_bytes(499, 1, content), ("jpeg", 499, 1, None)),
        (M.wav_bytes(content), ("wav", None, None, len(content) * 10)),
        (content, ("raw", None, None, None)),
    ]:
        info = M.parse_container(payload)
        assert (
            info["container"], info["width"], info["height"], info["duration_ms"]
        ) == expect
        assert info["content"] == content
    import pytest as _pytest

    with _pytest.raises(ValueError):  # claimed signature + broken body raises
        M.parse_container(b"\x89PNG\r\n\x1a\njunk")
    with _pytest.raises(ValueError):
        M.parse_container(b"\xff\xd8\xff\xfe\x00\x04ab\xff\xd9")  # no SOF


def test_bigram_lm_scores(spark):
    """Laplace bigram LM: n_bigrams = tokens-1; a document made of the
    corpus's dominant pattern outscores a one-off garble doc (higher
    average milli-nat log-prob); 0/1-token docs emit no row."""
    from smoltable_spark.functions import text as X

    rows = (
        [(i, "the cat sat on the mat") for i in range(10)]
        + [(100, "zq xv qzk wvx")]
        + [(101, "single")]
        + [(102, "")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in X.bigram_lm_scores(df).collect()}
    assert 101 not in out and 102 not in out
    assert out[0]["n_bigrams"] == 5
    assert out[100]["n_bigrams"] == 3
    avg_common = out[0]["sum_logp_milli"] / out[0]["n_bigrams"]
    avg_garble = out[100]["sum_logp_milli"] / out[100]["n_bigrams"]
    assert avg_common > avg_garble


def test_multimodal_real_bmp_and_pcm_decode(spark):
    """Round-4: BMP pixel and WAV PCM decode are REAL — mean_luma / rms_amp
    computed from the decoded container bytes must equal the closed-form
    values of the generator formulas (the same arithmetic the mm_features
    oracle runs in DuckDB)."""
    import math as m

    from smoltable_spark.functions import multimodal as M

    rows = [(i, f"doc number {i} text", "en") for i in (0, 1, 2, 3, 4, 6, 18)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    media = M.synthesize_media(docs)
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}

    assert feats[0]["container"] == "png" and feats[3]["container"] == "jpeg"
    assert feats[2]["container"] == "raw"
    for mid in (0, 6, 18):  # png (id%12==0) and bmp (id%12==6): real pixels
        r = feats[mid]
        assert r["container"] == ("png" if mid % 12 == 0 else "bmp")
        w, h = 16 + mid % 64, 16 + mid % 48
        assert (r["width"], r["height"]) == (w, h)
        expect = sum((mid + j) % 256 for j in range(w * h)) / (w * h)
        assert r["mean_luma"] == expect
        assert r["rms_amp"] is None and r["payload_sha"] is not None
    for mid in (1, 4):  # audio -> WAV carrying real int16 PCM
        r = feats[mid]
        assert r["container"] == "wav"
        n = 64 + mid % 192
        assert r["duration_ms"] == n * 20
        expect = m.sqrt(
            sum(((mid + i) % 256 - 128) ** 2 for i in range(n)) / n
        )
        assert r["rms_amp"] == expect
        assert r["mean_luma"] is None
    # round-5: JPEG scans are REAL too — the decoded mean_luma must match
    # the block-constant generator formula (exact DC-only DCT round-trip)
    r = feats[3]
    w, h = 16 + 3 % 64, 16 + 3 % 48
    bw, bh = (w + 7) // 8, (h + 7) // 8
    expect = sum(
        ((3 + by * bw + bx) % 256) * min(8, w - 8 * bx) * min(8, h - 8 * by)
        for by in range(bh)
        for bx in range(bw)
    ) / (w * h)
    assert r["mean_luma"] == expect and r["rms_amp"] is None
    # opaque (raw) containers: no decoded features
    assert feats[2]["mean_luma"] is None and feats[2]["rms_amp"] is None


def test_png_decode_all_filter_types():
    """png_bytes -> png_decode round-trips the encoder's None/Sub/Up
    filters; hand-built Average/Paeth scanlines (the spec's sequential
    recurrences) decode exactly; unknown filter types raise."""
    import random
    import zlib

    import numpy as np
    import pytest as _pytest

    from smoltable_spark.functions import multimodal as M

    for w, h, mid in [(37, 21, 0), (1, 1, 36), (5, 2, 48), (80, 64, 24)]:
        px = M.luma_pixels(mid, w, h)
        info = M.parse_container(M.png_bytes(w, h, b"txt", px))
        assert (info["depth"], info["color_type"]) == (8, 0)
        assert M.png_decode(info["idat"], w, h).tobytes() == px

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    rng = random.Random(7)
    w, h = 9, 6
    px = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    out = bytearray()
    for r in range(h):
        ft = 3 + r % 2  # Average / Paeth alternating
        out.append(ft)
        for x in range(w):
            left = px[r][x - 1] if x > 0 else 0
            up = px[r - 1][x] if r > 0 else 0
            ul = px[r - 1][x - 1] if (r > 0 and x > 0) else 0
            pred = (left + up) // 2 if ft == 3 else paeth(left, up, ul)
            out.append((px[r][x] - pred) % 256)
    dec = M.png_decode(zlib.compress(bytes(out)), w, h)
    assert (dec == np.array(px)).all()

    with _pytest.raises(ValueError):
        M.png_decode(zlib.compress(b"\x07" + bytes(3)), 3, 1)


def test_bmp_container_roundtrip_unit():
    """bmp_bytes -> parse_container recovers dims and unpadded pixels for
    widths that exercise every stride-padding case (w*3 % 4 in all states)."""
    from smoltable_spark.functions import multimodal as M

    for w, h in [(1, 2), (2, 2), (3, 1), (4, 3), (5, 4)]:
        luma = bytes((7 * i + 3) % 256 for i in range(w * h))
        info = M.parse_container(M.bmp_bytes(w, h, luma))
        assert info["container"] == "bmp"
        assert (info["width"], info["height"]) == (w, h)
        triplets = info["content"]
        assert len(triplets) == w * h * 3
        assert triplets[0::3] == luma  # B channel
        assert triplets[1::3] == luma and triplets[2::3] == luma


# ---------------------------------------------------------------------------
# Gopher repetition signals


def test_repetition_signals_extremes(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),                       # degenerate
        (2, "a b c d e f g h i j"),                                 # all unique
        (3, "buy now. buy now. buy now. totally different line"),   # dup lines
        (4, ""),                                                    # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in text.repetition_signals_df(df).collect()}
    # all bigrams identical -> the top 2-gram owns the full char mass
    assert out[1]["top2gram_milli"] == 1000 and not out[1]["keep"]
    # fewer than 10 tokens -> no 10-grams -> 0 by convention
    assert out[1]["dup10gram_milli"] == 0
    # unique tokens: top bigram = 1 of 9 equal-length grams
    assert out[2]["top2gram_milli"] == 111 and out[2]["keep"]
    assert out[2]["dup5gram_milli"] == 0
    # 3 of 4 '. '-units repeated -> 750 permille by count
    assert out[3]["dup_line_milli"] == 750 and not out[3]["keep"]
    # 'buy now' x3 = 21 chars of 43 total -> 488 permille by chars
    assert out[3]["dup_line_char_milli"] == 488
    # empty text: all-zero signals, keep (word-count rules live elsewhere)
    assert out[4] == dict(
        doc_id=4, top2gram_milli=0, top3gram_milli=0, top4gram_milli=0,
        dup5gram_milli=0, dup10gram_milli=0, dup_line_milli=0,
        dup_line_char_milli=0, keep=True,
    )


def test_repetition_signals_counts_repeats(spark):
    # "one two three" x3 + tail: the repeated trigram inflates top3 and dup5
    df = spark.createDataFrame(
        [(5, "one two three one two three one two three nine ten")],
        "doc_id long, text string",
    )
    r = text.repetition_signals_df(df).collect()[0]
    # 9 trigrams; "one two three" occurs 3x (13 chars): 39 of 119 chars
    assert r["top3gram_milli"] == 327
    assert r["dup5gram_milli"] > 0 and not r["keep"]


def test_repetition_signals_top_tiebreak(spark):
    # two bigrams tie on count=1; the longer one owns more char mass
    df = spark.createDataFrame([(6, "aa bbbb cc")], "doc_id long, text string")
    r = text.repetition_signals_df(df).collect()[0]
    # grams: "aa bbbb"(7), "bbbb cc"(7) -> tie on count AND mass -> first
    # in sort order wins; either way mass = 7 of 14 -> 500
    assert r["top2gram_milli"] == 500


def test_cluster_split_is_leakage_safe(spark, sf_dir):
    """Every MinHash near-dup pair must land in ONE split — the property
    pipeline_cluster_split exists to guarantee."""
    from smoltable_spark.queries_analytics import ANALYTICS_QUERIES
    from smoltable_spark.sources.relational import load_table

    fn = ANALYTICS_QUERIES["pipeline_cluster_split"][0]
    split_of = {r["doc_id"]: r["split"] for r in fn(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        docs, num_hashes=16, bands=4, k=3, threshold=0.5
    ).select("id_a", "id_b").collect()
    assert pairs, "fixture corpus must contain near-dups for this test"
    for r in pairs:
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (r["id_a"], r["id_b"])
    # and the split is non-degenerate on the full corpus
    assert len(set(split_of.values())) >= 2


def test_ccnet_buckets_partition_per_language(spark, sf_dir):
    """Each language's scored docs split into near-equal terciles; within
    a language every head doc outscores every tail doc."""
    from collections import defaultdict

    from smoltable_spark.sources.relational import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = text.ccnet_buckets(docs).collect()
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r["lang"]][r["bucket"]].append(r["avg_milli"])
    assert by_lang, "expected scored docs"
    for lang, buckets in by_lang.items():
        n = sum(len(v) for v in buckets.values())
        if n < 9:
            continue
        for name in ("head", "middle", "tail"):
            assert buckets[name], (lang, name)
            # no bucket grabs more than ~half of a language (ties aside)
            assert len(buckets[name]) <= n * 0.55 + 1, (lang, name)
        assert min(buckets["head"]) > max(buckets["tail"]), lang


def test_dedup_lines_removes_repeats_keeps_first(spark):
    rows = [
        (1, "alpha beta. gamma. alpha beta. delta. gamma"),
        (2, "unique one. unique two"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in text.dedup_lines_df(df).collect()}
    import hashlib

    # doc 1: "alpha beta" and "gamma" repeat -> 2 removed, order preserved
    assert out[1]["n_units"] == 5 and out[1]["n_removed"] == 2
    want = "alpha beta. gamma. delta"
    assert out[1]["clean_sha"] == hashlib.md5(want.encode()).hexdigest()
    assert out[1]["n_chars_removed"] == len("alpha beta") + len("gamma")
    # no repeats -> untouched
    assert out[2]["n_removed"] == 0
    assert out[2]["clean_sha"] == hashlib.md5(b"unique one. unique two").hexdigest()
    # empty text: one empty unit, nothing removed
    assert out[3]["n_units"] == 1 and out[3]["n_removed"] == 0


def test_oov_rate_against_small_vocab(spark):
    """vocab_size=2 keeps the two most frequent tokens; everything else
    counts as OOV with multiplicity; empty docs get a 0 row."""
    rows = [
        (1, "aa aa aa bb bb cc"),
        (2, "aa bb"),
        (3, "zz yy xx"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in text.oov_rate_df(df, vocab_size=2).collect()}
    # corpus counts: aa=4, bb=3, cc=1, xx/yy/zz=1 -> vocab {aa, bb}
    assert out[1] == dict(doc_id=1, n_tokens=6, n_oov=1, oov_milli=166)
    assert out[2] == dict(doc_id=2, n_tokens=2, n_oov=0, oov_milli=0)
    assert out[3] == dict(doc_id=3, n_tokens=3, n_oov=3, oov_milli=1000)
    assert out[4] == dict(doc_id=4, n_tokens=0, n_oov=0, oov_milli=0)


def test_dedup_lines_arrow_equals_expression(spark):
    """The linear Arrow scrub must produce byte-identical rows to the
    expression form — including a pathological many-unit document."""
    long_doc = ". ".join(f"unit {i % 37}" for i in range(800))
    rows = [
        (1, "alpha beta. gamma. alpha beta. delta. gamma"),
        (2, ""),
        (3, long_doc),
        (4, "trailing. sep. trailing. "),
        (5, None),  # NULL text → all-NULL metrics in BOTH paths (r4 review)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, text.dedup_lines_df(df).collect()))
    b = sorted(map(tuple, text.dedup_lines_df(df, arrow=True).collect()))
    assert a == b


def test_parse_container_text_starting_with_BM_is_raw(spark):
    """'BM' is printable ASCII; a text payload starting with it must fall
    through to 'raw', not crash the BMP parser (r4 review finding)."""
    payload = (
        b"BMW announced today that the new electric lineup will ship in "
        b"2027 worldwide, the company said."
    )
    r = multimodal.parse_container(payload)
    assert r["container"] == "raw" and r["content"] == payload


def test_repetition_filter_stays_above_exchange(spark, sf_dir):
    """Pinning the pushdown barrier (r4 review finding): a consumer's
    .filter('keep') must evaluate ABOVE the spread exchange — if the fold
    battery is ever re-inlined below it, a single-file corpus runs the
    whole battery single-partition (measured 30x slower)."""
    from smoltable_spark.sources.relational import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = text.repetition_signals_df(docs).filter("keep")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # walk the tree: the first Filter must appear ABOVE (before) the
    # Exchange introduced by spread(); scan-level IsNotNull filters below
    # the exchange are fine, a Filter containing `keep`'s fold battery is
    # not — detect by requiring NO 'aggregate(' expression under any
    # node below the exchange
    below_exchange = plan.split("Exchange", 1)[1]
    assert "aggregate(sort_array" not in below_exchange, (
        "fold battery was pushed below the spread exchange"
    )


def test_scrub_repeated_spans_masks_shared_prefix(spark):
    """Docs 1 and 2 share a 10-token prefix -> three overlapping banned
    8-grams cover tokens 1..10, leaving only the distinct tails; the
    unrelated doc is untouched."""
    import hashlib

    rows = [
        (1, "a b c d e f g h unique tail one"),
        (2, "a b c d e f g h unique tail two"),
        (3, "totally different words with no shared spans here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in dedup.scrub_repeated_spans(df).collect()}
    assert out[1]["n_removed"] == 10 and out[1]["n_spans"] == 3
    assert out[1]["clean_sha"] == hashlib.md5(b"one").hexdigest()
    assert out[2]["clean_sha"] == hashlib.md5(b"two").hexdigest()
    assert out[3]["n_removed"] == 0 and out[3]["n_spans"] == 0
    assert out[3]["clean_sha"] == hashlib.md5(
        b"totally different words with no shared spans here at all"
    ).hexdigest()


def test_scrub_repeated_spans_no_bans_below_min_docs(spark):
    """An 8-gram repeated only WITHIN one document is not cross-doc
    boilerplate and must survive."""
    t = "x1 x2 x3 x4 x5 x6 x7 x8 middle x1 x2 x3 x4 x5 x6 x7 x8"
    df = spark.createDataFrame(
        [(1, t), (2, "nothing in common here at all whatsoever today")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dedup.scrub_repeated_spans(df).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["n_spans"] == 0


# ---------------------------------------------------------------------------
# product quantization


def _pq_fixture(spark, n=40, dim=8, seed=13):
    import random

    rnd = random.Random(seed)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_nearest_codeword_numpy_differential(spark):
    """Every emitted code is the argmin-L2 codeword for that (vector,
    subspace), ties to lowest cid — verified against a numpy recompute
    from the trained codebooks."""
    import numpy as np

    from smoltable_spark.functions import similarity as S

    emb = _pq_fixture(spark)
    cb = S.pq_codebooks(emb, m=4, ksub=4, iters=2, dim=8)
    codes = S.pq_encode(emb, cb, m=4, dim=8)
    cw = {}
    for r in cb.collect():
        cw[(r["m"], r["cid"])] = np.array(r["cw"], dtype=np.int64)
    qv = {
        r["vec_id"]: np.array(r["sq"], dtype=np.int64)
        for r in S.pq_subvectors(emb, m=1, dim=8).collect()
    }
    got = {(r["vec_id"], r["m"]): r["code"] for r in codes.collect()}
    assert len(got) == 40 * 4
    for (vid, m), code in got.items():
        sub = qv[vid][m * 2 : (m + 1) * 2]
        dists = {
            cid: int(((sub - w) ** 2).sum())
            for (mm, cid), w in cw.items()
            if mm == m
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert code == best, (vid, m, code, dists)


def test_pq_adc_recovers_exact_l2_when_every_vector_is_a_codeword(spark):
    """ksub ≥ corpus size and iters=0 ⟹ each vector's codeword IS its own
    subvector, so the ADC lookup-table distance degenerates to the exact
    integer squared-L2 between query and neighbor — the property that
    pins the whole lut/codes join arithmetic."""
    import numpy as np

    from smoltable_spark.functions import similarity as S

    emb = _pq_fixture(spark, n=12, seed=5)
    cb = S.pq_codebooks(emb, m=4, ksub=12, iters=0, dim=8)
    queries = emb.filter("vec_id < 2")
    out = S.pq_topk_adc(emb, queries, cb, k=11, m=4, dim=8)
    qv = {}
    for r in S.pq_subvectors(emb, m=1, dim=8).collect():
        qv[r["vec_id"]] = np.array(r["sq"], dtype=np.int64)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    for r in rows:
        exact = int(((qv[r["query_id"]] - qv[r["neighbor_id"]]) ** 2).sum())
        assert r["adc_dist"] == exact, r


def test_pq_codes_shape_and_range(spark):
    from smoltable_spark.functions import similarity as S

    emb = _pq_fixture(spark, n=25, seed=3)
    cb = S.pq_codebooks(emb, m=4, ksub=4, iters=1, dim=8)
    codes = S.pq_encode(emb, cb, m=4, dim=8).collect()
    assert len(codes) == 25 * 4
    assert all(0 <= r["code"] < 4 for r in codes)
    assert all(0 <= r["m"] < 4 for r in codes)


def test_ivfpq_index_full_probe_matches_brute_adc(spark, tmp_path):
    """With nprobe = n_centroids the persisted IVF-PQ search covers every
    list, so it must return exactly the in-memory brute ADC answer built
    from the same codebooks; the probed read must carry a list_id
    partition filter."""
    from smoltable_spark import plans
    from smoltable_spark.functions import similarity as S

    emb = _pq_fixture(spark, n=30, seed=21)
    cb = S.pq_codebooks(emb, m=4, ksub=4, iters=1, dim=8)
    path = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(emb, path, n_centroids=3, codebooks=cb, m=4, dim=8)
    qs = emb.filter("vec_id < 2")
    served = S.query_ivfpq_index(spark, path, qs, k=29, nprobe=3, m=4, dim=8)
    brute = S.pq_topk_adc(emb, qs, cb, k=29, m=4, dim=8)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, brute.collect()))
    assert any("list_id" in f for f in plans.audit(served)["partition_filters"])


def test_ivfpq_narrow_probe_restricts_candidates(spark, tmp_path):
    """nprobe=1 scans only each query's own list — candidates are a
    strict subset of the corpus, and the index carries no raw vectors
    (codes + codebooks + centroids only)."""
    from smoltable_spark.functions import similarity as S

    emb = _pq_fixture(spark, n=40, seed=2)
    path = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(emb, path, n_centroids=4, m=4, ksub=4, iters=1, dim=8)
    qs = emb.filter("vec_id < 2")
    out = S.query_ivfpq_index(spark, path, qs, k=40, nprobe=1, m=4, dim=8)
    per_query = {}
    for r in out.collect():
        per_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for _, neighbors in per_query.items():
        assert len(neighbors) < 39
    idx_cols = set(spark.read.parquet(path).columns)
    assert "embedding" not in idx_cols and "q" not in idx_cols, idx_cols


# ---------------------------------------------------------------------------
# BPE merge learning


def _bpe_reference(words, n_merges):
    """Pure-Python classic BPE: pair counts -> argmax (count desc, then
    lhs/rhs) -> greedy left-to-right merge. The ground truth the Spark
    fold must reproduce."""
    from collections import Counter

    seqs = [list(w) for w in words]
    merges = []
    for step in range(1, n_merges + 1):
        c = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += 1
        if not c:
            break
        (a, b), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, a + b, cnt))
        for idx, s in enumerate(seqs):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[idx] = out
    return merges


@pytest.mark.parametrize(
    "corpus",
    [
        "aaaa bb aaaa",          # a==a overlapping runs (greedy 0,2 offsets)
        "ababab ba ab",          # alternating chains
        "low lower lowest low",  # classic BPE demo words
    ],
)
def test_bpe_train_matches_python_reference(spark, corpus):
    from smoltable_spark.functions import text as X

    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in X.bpe_train(docs, n_merges=3).collect()
    ]
    assert got == _bpe_reference(corpus.split(), 3), corpus


def test_bpe_apply_matches_reference_encoding(spark):
    """bpe_apply with the learned merge table reproduces the reference
    encoder's per-doc piece counts (chained greedy folds ≡ sequential
    greedy merge application)."""
    from smoltable_spark.functions import text as X

    corpus = {1: "low lower lowest", 2: "aaaa ab lowest low", 3: "b"}
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    merges = [
        (r["lhs"], r["rhs"]) for r in X.bpe_train(docs, n_merges=3).collect()
    ]
    # reference encode: apply each merge greedily in order, per word
    def encode(words):
        seqs = [list(w) for w in words]
        for a, b in merges:
            for idx, s in enumerate(seqs):
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[idx] = out
        return sum(len(s) for s in seqs)

    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in X.bpe_apply(docs, merges).collect()}
    for did, txt in corpus.items():
        words = txt.split()
        assert got[did] == (len(words), encode(words)), (did, merges)


def test_rrf_fuse_full_outer_and_integer_scores(spark):
    """RRF fusion: single-leg docs still score, contributions are the
    exact integer 1000000 // (60 + rank), ties break by doc id, and the
    final rank follows (score desc, id)."""
    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, lex_rank int"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2)], "neighbor_id long, rank int"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in similarity.rrf_fuse(
            lex, sem, "doc_id", "lex_rank", "neighbor_id", "rank", k=10
        ).collect()
    }
    S, K = similarity.RRF_SCALE, similarity.RRF_K
    # doc 20 in both legs; 10/30 lexical-only; 40 semantic-only
    assert out[20]["rrf_micro"] == S // (K + 2) + S // (K + 1)
    assert out[10]["rrf_micro"] == S // (K + 1)
    assert out[40]["rrf_micro"] == S // (K + 2)
    assert out[30]["rrf_micro"] == S // (K + 3)
    assert out[10]["sem_rank"] is None and out[40]["lex_rank"] is None
    # full order: 20 (both legs, 32522) > 10 (16393) > 40 (16129) > 30 (15873)
    assert [out[d]["rank"] for d in (20, 10, 40, 30)] == [1, 2, 3, 4]


def test_mmr_rerank_prefers_diversity(spark):
    """Greedy MMR: after picking the most relevant doc, a near-duplicate
    of it (high rel, high sim-to-selected) loses to a diverse candidate."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),      # query
            (1, [0.91, 0.44]),    # A: most relevant (rel ~0.900)
            (2, [0.90, 0.45]),    # B: near-dup of A (sim ~0.9999), rel ~0.894
            (3, [0.90, -0.44]),   # C: mirrored — rel ~0.898, sim(C,A) ~0.62
        ],
        "vec_id long, embedding array<float>",
    )
    cands = similarity.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=3
    )
    members = emb.join(
        cands.select(F.col("neighbor_id").alias("vec_id")), "vec_id", "left_semi"
    )
    out = similarity.mmr_rerank(
        cands, similarity.pairwise_cosine(members), k=3, lam=0.7
    ).collect()
    order = [r["doc_id"] for r in sorted(out, key=lambda r: r["pick"])]
    assert order[0] == 1          # pure relevance first
    assert order[1] == 3          # diversity beats the near-dup
    assert order[2] == 2
    by_pick = {r["pick"]: r for r in out}
    assert abs(by_pick[1]["mmr_score"] - 0.7 * by_pick[1]["rel"]) < 1e-12


def test_pq_refine_exact_matches_global_l2_on_full_candidates(spark, vectors):
    """With the candidate set = ALL corpus vectors, the refine stage IS
    an exact integer-L2 top-k — pin it against a Python recomputation."""
    q = vectors.filter(F.col("vec_id") == 0)
    corpus = vectors
    all_cands = (
        corpus.selectExpr("vec_id AS neighbor_id")
        .filter(F.col("neighbor_id") != 0)
        .crossJoin(q.selectExpr("vec_id AS query_id"))
    )
    out = similarity.pq_refine_exact(corpus, q, all_cands, k=4).collect()
    rows = {r["vec_id"]: r["embedding"] for r in vectors.collect()}
    Q = similarity.QUANT

    def l2(a, b):
        qa = [round(float(x) * Q) for x in a]
        qb = [round(float(x) * Q) for x in b]
        return sum((x - y) ** 2 for x, y in zip(qa, qb))

    expect = sorted(
        ((l2(rows[0], rows[i]), i) for i in rows if i != 0),
    )
    got = [(r["l2_dist"], r["neighbor_id"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    assert got == expect[:4], (got, expect)
