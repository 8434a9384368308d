"""Round-5 fixes: containment recall floor, threshold rounding,
MMR sparse-similarity robustness.

VERDICT r4 "What's missing" #3 / ADVICE r4: the containment candidate
generator only indexed shingles with df in [2, max_df], so a subset
copy whose EVERY shingle is shared by more than max_df documents (the
heavy-duplication corpora dedup exists for) produced zero candidates —
and the DuckDB oracle mirrored the same candidate step, so the green
cert could never catch the miss. These tests probe the engine against
the METRIC (planted pairs + a brute-force Python model), not against
the oracle.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from smoltable_spark.functions import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _shingle_set(text, k=3):
    toks = [t for t in "".join(
        c.lower() if c.isalnum() else " " for c in text
    ).split() if t]
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


BOILER = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill every single morning"
)


class TestContainmentRecallFloor:
    def test_all_ubiquitous_shingles_still_found(self, spark):
        """25 identical boilerplate docs (every shingle df=25 > max_df=20)
        plus one superset doc: before the r5 rarest-shingle anchor
        channel this produced ZERO candidates; now every doc indexes its
        rarest >=2-df shingles and all pairs are found."""
        texts = [BOILER] * 24 + [BOILER + " plus a unique trailing clause here"]
        out = dedup.containment_near_duplicates(
            _docs(spark, texts), k=3, threshold=0.8, max_df=20
        )
        rows = out.collect()
        n = len(texts)
        assert len(rows) == n * (n - 1) // 2  # 300: every pair, containment 1.0
        assert all(abs(r["containment"] - 1.0) < 1e-12 for r in rows)

    def test_subset_copy_inside_heavy_duplication(self, spark):
        """The exact VERDICT scenario: a short doc pasted inside a longer
        one, where the shared content also appears in >max_df other
        docs. The (contained, container) pair must be found."""
        short = BOILER
        container = (
            "completely different opening paragraph about distributed "
            "query engines " + BOILER + " and an equally different closing"
        )
        texts = [BOILER] * 22 + [short, container]
        out = dedup.containment_near_duplicates(
            _docs(spark, texts), k=3, threshold=0.8, max_df=20
        )
        pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
        assert (22, 23) in pairs  # the planted subset-copy pair

    def test_container_with_rarer_own_shingles(self, spark):
        """The round-5 self-review counterexample: container B's OWN
        rarest shingles (a df-2 tail shared with C) are rarer than
        everything inside the contained boilerplate A, so B's per-doc
        rarest postings never overlap A's — the single-step anchor
        channel missed all 24 (A_i, B) containment-1.0 pairs. The
        two-step fix (every doc posts every ANCHOR shingle it contains)
        must find them all."""
        tail = "completely unique trailing sentence shared by two docs only"
        texts = [BOILER] * 24 + [BOILER + " " + tail, "prefix words " + tail]
        out = dedup.containment_near_duplicates(
            _docs(spark, texts), k=3, threshold=0.8, max_df=20
        )
        pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
        for i in range(24):  # every (A_i, B) subset-copy pair
            assert (i, 24) in pairs, f"missed containment-1.0 pair ({i}, 24)"

    def test_full_containment_pairs_always_found(self, spark):
        """Brute-force differential for the r5 guarantee: every pair with
        containment == 1.0 (true subset copies) is in the output,
        whatever the df profile — the container holds every contained
        shingle including its rarest, so they always collide on an
        anchor posting. Also soundness: every emitted pair really meets
        the threshold per the Python model."""
        texts = (
            [BOILER] * 23
            + [
                BOILER + " extra tail one for the first superset document",
                BOILER + " another other tail for the second superset",
                "an unrelated document about baking sourdough bread at home "
                "with a long fermentation schedule and plenty of patience",
                "short rare text fragment",
            ]
        )
        out = dedup.containment_near_duplicates(
            _docs(spark, texts), k=3, threshold=0.8, max_df=20
        )
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        sets = {i: _shingle_set(t) for i, t in enumerate(texts)}
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            cont = len(sa & sb) / min(len(sa), len(sb))
            if cont == 1.0:
                assert (a, b) in got, f"missed full-containment pair {(a, b)}"
        for a, b in got:
            sa, sb = sets[a], sets[b]
            cont = len(sa & sb) / min(len(sa), len(sb))
            assert cont >= 0.8 - 1e-12, f"unsound pair {(a, b)}: {cont}"


def test_threshold_quantization_rounds_not_truncates():
    """ADVICE r4: int(threshold * 1000) floors; round() picks the
    nearest permille. For every permille-grid threshold i/1000 the
    double product happens to round back exactly (verified: no i in
    1..999 truncates), but any threshold OFF the grid (0.6996) or any
    float whose product lands a hair under the integer is silently
    relaxed by int(). Both engine and oracle must use round(). Locked
    at the source level so the fix can't regress in one engine only
    (the oracle mirrors the arithmetic, so a runtime probe at the
    boundary would need a 1000-shingle fixture; the source invariant
    is the cheap, complete check)."""
    import glob
    import os

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "smoltable_spark",
    )
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        src = open(path).read()
        if "int(threshold" in src:
            offenders.append(path)
    assert not offenders, f"truncating threshold quantization in {offenders}"
    assert round(0.6996 * 1000) == 700 and int(0.6996 * 1000) == 699  # the bug shape


class TestMmrSparseSims:
    def test_candidate_without_pair_rows_survives(self, spark):
        """ADVICE r4: with a sparse pair_sims table, a remaining
        candidate that has no similarity row to any selected doc must
        score with penalty 0 (no measured redundancy), not vanish from
        the race. d3 has no pair rows at all; with penalty 0 its MMR
        score beats d2's (which is near-duplicate of the first pick),
        so pick 2 must be d3."""
        from smoltable_spark.functions.similarity import mmr_rerank

        cands = spark.createDataFrame(
            [(1, 0.9), (2, 0.8), (3, 0.5)], "neighbor_id long, cosine double"
        )
        pair_sims = spark.createDataFrame(
            [(1, 2, 0.99), (2, 1, 0.99)], "a long, b long, sim double"
        )
        out = {r["pick"]: r for r in mmr_rerank(cands, pair_sims, k=3).collect()}
        assert out[1]["doc_id"] == 1
        # lam=0.7: d2 scores .7*.8-.3*.99=0.263, d3 scores .7*.5-0=0.35
        assert out[2]["doc_id"] == 3
        assert out[2]["mmr_score"] == pytest.approx(0.35)
        assert out[3]["doc_id"] == 2
        assert out[3]["mmr_score"] == pytest.approx(0.263)

    def test_complete_matrix_unchanged(self, spark):
        """With a complete pairwise matrix the left-join fix is a no-op:
        classic MMR behavior (diversification beats raw relevance
        order) still holds."""
        from smoltable_spark.functions.similarity import mmr_rerank

        cands = spark.createDataFrame(
            [(1, 0.95), (2, 0.94), (3, 0.6)], "neighbor_id long, cosine double"
        )
        rows = []
        sims = {(1, 2): 0.99, (1, 3): 0.1, (2, 3): 0.1}
        for (a, b), s in sims.items():
            rows += [(a, b, s), (b, a, s)]
        pair_sims = spark.createDataFrame(rows, "a long, b long, sim double")
        out = {r["pick"]: r["doc_id"] for r in
               mmr_rerank(cands, pair_sims, k=3).collect()}
        # pick2: d2 = .7*.94-.3*.99=.361, d3 = .7*.6-.3*.1=.39 -> d3 wins
        assert out == {1: 1, 2: 3, 3: 2}


def test_bench_covers_entire_registry():
    """VERDICT r4 ask #3: every registry query must sit inside the bench
    regression gate. bench_query_names() appends non-HEADLINE registry
    entries, so coverage is complete by construction — this pins it."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    order = bench.bench_query_names(registry)
    assert set(order) == set(registry)
    assert len(order) == len(registry)  # no duplicates
    # curated prefix preserved as stable comparison keys
    curated = [n for n in bench.HEADLINE if n in registry]
    assert order[: len(curated)] == curated


class TestJpegBaselineCodec:
    """Round-5 (VERDICT r4 ask #9): the JPEG stub is retired. The shipped
    encoder emits DC-only block-constant scans (exactly invertible, so
    oracle-pinnable); these tests additionally drive the DECODER's
    general paths — AC run/size symbols, ZRL, zigzag, dequantization —
    with a test-only full DCT encoder."""

    def test_dc_only_roundtrip_exact(self):
        import numpy as np
        from smoltable_spark.functions import multimodal as M

        for mid in (0, 3, 9, 77, 130, 255):
            w, h = 16 + mid % 64, 16 + mid % 48
            bv = M.jpeg_block_values(mid, w, h)
            info = M.parse_container(M.jpeg_bytes(w, h, b"txt", bv))
            px = M.jpeg_decode(info)
            expect = np.repeat(np.repeat(bv, 8, 0), 8, 1)[:h, :w]
            assert (px == expect).all()

    def test_general_scan_near_lossless(self):
        """Arbitrary pixels through the library full-DCT encoder
        (jpeg_bytes_pixels, promoted from a test helper to back the real
        resize_media) decode with max error <= 1 (unit quant table: the
        only loss is coefficient rounding) — exercising AC symbols, ZRL,
        zigzag, and EXTEND."""
        import numpy as np
        from smoltable_spark.functions import multimodal as M

        w, h = 21, 13  # partial MCUs on both axes
        px = ((np.arange(w * h, dtype=np.int64) * 37 + 11) % 256).astype(
            np.uint8
        )
        payload = M.jpeg_bytes_pixels(w, h, b"", px)
        info = M.parse_container(payload)
        out = M.jpeg_decode(info)
        err = np.abs(out.astype(np.int64) - px.reshape(h, w).astype(np.int64))
        assert err.max() <= 1, err.max()

    def test_unsupported_shapes_raise(self):
        import numpy as np
        import pytest
        from smoltable_spark.functions import multimodal as M

        bv = M.jpeg_block_values(5, 16, 16)
        payload = bytearray(M.jpeg_bytes(16, 16, b"x", bv))
        i = payload.index(b"\xff\xc0")
        payload[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        # r7: SOF2 now DECODES (spectral selection); a baseline stream
        # with a flipped marker is a CORRUPT progressive stream (its
        # single scan claims Ss=0, Se=63 — illegal for a DC scan), so
        # the raise tightened from NotImplementedError to ValueError.
        # tests/test_round7.py pins the narrowed Ah/Al boundary.
        with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
            M.jpeg_decode(M.parse_container(bytes(payload)))
        with pytest.raises(ValueError, match="scan"):
            M.jpeg_decode(M.parse_container(M.jpeg_bytes(8, 8, b"x")))

    def test_luma_histogram_includes_jpeg(self, spark):
        import pandas as pd
        from smoltable_spark.functions import multimodal as M

        docs = spark.createDataFrame(
            [(3, "a jpeg doc"), (0, "a png doc")], "doc_id long, text string"
        )
        media = M.synthesize_media(docs)
        hist = M.luma_histogram(media, n_buckets=8).toPandas()
        assert set(hist["media_id"]) == {0, 3}
        w, h = 19, 19
        bw = (w + 7) // 8
        jp = hist[hist["media_id"] == 3]
        expect = {}
        for by in range((h + 7) // 8):
            for bx in range(bw):
                v = (3 + by * bw + bx) % 256
                npx = min(8, w - 8 * bx) * min(8, h - 8 * by)
                expect[v // 32] = expect.get(v // 32, 0) + npx
        got = dict(zip(jp["bucket"], jp["n_px"]))
        assert got == expect


def test_containment_anchor_guard(spark):
    """max_anchor_df: a pathological corpus whose anchor posting lists
    exceed the guard raises instead of launching a quadratic pair job;
    the default guard (100k) passes the same corpus."""
    import pytest
    from smoltable_spark.functions.dedup import containment_near_duplicates

    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_anchor_df"):
        containment_near_duplicates(docs, max_anchor_df=3).collect()
    out = containment_near_duplicates(docs).collect()  # default guard: fine
    assert len(out) == 15  # 6 identical docs -> all C(6,2) clone pairs


class TestJpegCodecProperties:
    """Hypothesis property suites for the round-5 JPEG codec (no Spark)."""

    def test_dc_only_roundtrip_property(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st
        from smoltable_spark.functions import multimodal as M

        @settings(max_examples=120, deadline=None)
        @given(
            w=st.integers(1, 80),
            h=st.integers(1, 64),
            seed=st.integers(0, 2**31 - 1),
            content=st.binary(max_size=200),
        )
        def prop(w, h, seed, content):
            bw, bh = (w + 7) // 8, (h + 7) // 8
            rng = np.random.default_rng(seed)
            bv = rng.integers(0, 256, size=(bh, bw), dtype=np.int64).astype(
                np.uint8
            )
            info = M.parse_container(M.jpeg_bytes(w, h, content, bv))
            assert info["content"] == content
            px = M.jpeg_decode(info)
            expect = np.repeat(np.repeat(bv, 8, 0), 8, 1)[:h, :w]
            assert px.shape == (h, w) and (px == expect).all()

        prop()

    def test_full_dct_roundtrip_property(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st
        from smoltable_spark.functions import multimodal as M

        @settings(max_examples=40, deadline=None)
        @given(
            w=st.integers(1, 32),
            h=st.integers(1, 24),
            seed=st.integers(0, 2**31 - 1),
        )
        def prop(w, h, seed):
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, size=w * h, dtype=np.int64).astype(
                np.uint8
            )
            payload = M.jpeg_bytes_pixels(w, h, b"", px)
            out = M.jpeg_decode(M.parse_container(payload))
            err = np.abs(
                out.astype(np.int64) - px.reshape(h, w).astype(np.int64)
            )
            assert err.max() <= 1

        prop()


class TestEmbeddingMultiprobe:
    """Round-5: embedding_near_duplicates gains the multiprobe recall
    knob — the same candidate-gen-vs-metric blind spot class that
    containment had (a near-dup pair sign-flipped on one bucket dim
    never collides, and the oracle mirrors the bucketing)."""

    @pytest.fixture()
    def boundary_vectors(self, spark):
        # 0 and 1: cosine ~0.9995 but OPPOSITE sign on dim 1 (value near
        # zero) -> different SRP buckets; 2 is unrelated
        rows = [
            (0, [0.01, 1.0, 0.5, 0.5]),
            (1, [-0.01, 1.0, 0.5, 0.5]),
            (2, [-1.0, -1.0, 0.3, -0.2]),
        ]
        return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")

    def test_single_probe_misses_boundary_pair(self, spark, boundary_vectors):
        from smoltable_spark.functions.similarity import embedding_near_duplicates

        pairs = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(
                boundary_vectors, threshold=0.9, bucket_dims=[1, 2]
            ).collect()
        }
        assert (0, 1) not in pairs  # the documented single-probe bias

    def test_multiprobe_finds_boundary_pair(self, spark, boundary_vectors):
        from smoltable_spark.functions.similarity import embedding_near_duplicates

        out = embedding_near_duplicates(
            boundary_vectors, threshold=0.9, bucket_dims=[1, 2], multiprobe=True
        ).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in out}
        assert (0, 1) in pairs
        # uniqueness: probe fan-out must not duplicate pairs
        assert len(pairs) == len(out)
        # soundness: every emitted pair really meets the threshold
        assert all(r["cosine"] >= 0.9 for r in out)

    def test_multiprobe_superset_of_single(self, spark, boundary_vectors):
        from smoltable_spark.functions.similarity import embedding_near_duplicates

        single = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(
                boundary_vectors, threshold=0.9, bucket_dims=[1, 2]
            ).collect()
        }
        multi = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(
                boundary_vectors, threshold=0.9, bucket_dims=[1, 2], multiprobe=True
            ).collect()
        }
        assert single <= multi


class TestJpegRestartIntervals:
    """Round-5 self-review fix: DRI/RST restart intervals decode for real
    (byte-aligned segments, DC predictor reset) instead of being
    silently stripped into garbage; malformed shapes raise ValueError."""

    def test_restart_roundtrip_near_lossless(self):
        import numpy as np
        from smoltable_spark.functions import multimodal as M

        w, h = 37, 21
        px = ((np.arange(w * h, dtype=np.int64) * 57 + 5) % 256).astype(
            np.uint8
        )
        for interval in (1, 3, 7):
            info = M.parse_container(
                M.jpeg_bytes_pixels(w, h, b"c", px, restart_interval=interval)
            )
            assert info["dri"] == interval
            assert len(info["scan_segments"]) == -(-15 // interval)  # ceil
            out = M.jpeg_decode(info)
            err = np.abs(
                out.astype(np.int64) - px.reshape(h, w).astype(np.int64)
            )
            assert err.max() <= 1

    def test_restarts_without_dri_raise(self):
        import numpy as np
        import pytest
        from smoltable_spark.functions import multimodal as M

        px = np.zeros(64, dtype=np.uint8)
        payload = bytearray(M.jpeg_bytes_pixels(16, 8, b"c", np.tile(px, 2),
                                                restart_interval=1))
        i = payload.index(b"\xff\xdd")
        del payload[i : i + 6]  # strip the DRI segment, keep the RST marker
        info = M.parse_container(bytes(payload))
        assert len(info["scan_segments"]) > 1 and info["dri"] == 0
        with pytest.raises(ValueError, match="without a DRI"):
            M.jpeg_decode(info)

    def test_truncated_segment_raises_valueerror(self):
        import pytest
        from smoltable_spark.functions import multimodal as M

        # truncated length field must surface as the documented
        # corrupt-media ValueError, not a struct.error
        with pytest.raises(ValueError, match="truncated JPEG segment"):
            M.parse_container(b"\xff\xd8\xff\xfe")

    def test_truncated_dri_raises_valueerror(self):
        """Post-review fix: a DRI whose segment body is missing or cut
        mid-segment raised struct.error (not a ValueError subclass), so
        callers following the corrupt-media contract crashed."""
        import pytest
        from smoltable_spark.functions import multimodal as M

        # DRI claiming seglen=2 (empty body — DRI requires 2 bytes)
        with pytest.raises(ValueError, match="truncated DRI"):
            M.parse_container(b"\xff\xd8\xff\xdd\x00\x02\xff\xd9")
        # DRI payload cut mid-segment
        with pytest.raises(ValueError, match="truncated JPEG segment"):
            M.parse_container(b"\xff\xd8\xff\xdd\x00\x04\x00")


class TestBmpResizeOrientation:
    """Post-review fixes: resize_media must not silently flip top-down
    (negative-height) BMPs, and must refuse color BMPs instead of
    emitting their blue channel as grayscale."""

    @staticmethod
    def _top_down_variant(bu: bytes, w: int, h: int) -> bytes:
        """Rewrite a bottom-up BMP as the SAME raster image stored
        top-down (rows reversed, negative biHeight)."""
        import struct

        stride = (w * 3 + 3) & ~3
        off = 54
        rows = [bu[off + r * stride : off + (r + 1) * stride] for r in range(h)]
        td = bu[:off] + b"".join(reversed(rows))
        return td[:22] + struct.pack("<i", -h) + td[26:]

    def test_top_down_bmp_not_flipped(self, spark):
        import numpy as np
        from smoltable_spark.functions import multimodal as M

        w, h = 6, 4
        luma = (np.arange(w * h) % 256).astype(np.uint8)
        bu = M.bmp_bytes(w, h, luma.tobytes())
        td = self._top_down_variant(bu, w, h)
        assert M.parse_container(td)["top_down"]
        media = spark.createDataFrame(
            [(0, "image", bu, w, h, None), (1, "image", td, w, h, None)],
            M.MEDIA_SCHEMA,
        )
        rows = {
            r["media_id"]: r for r in M.resize_media(media, 3, 2).collect()
        }
        img = {}
        for mid, r in rows.items():
            info = M.parse_container(bytes(r["payload"]))
            assert not info["top_down"]  # both re-encode bottom-up
            img[mid] = np.frombuffer(info["content"], dtype=np.uint8)[::3]
        # same source raster => same resized raster, regardless of the
        # input's stored row order
        assert (img[0] == img[1]).all()

    def test_color_bmp_raises(self, spark):
        import struct

        import numpy as np
        import pytest
        from smoltable_spark.functions import multimodal as M

        w, h = 4, 2
        bu = bytearray(M.bmp_bytes(w, h, bytes(w * h)))
        bu[54] = 200  # first pixel's B channel only: no longer grayscale
        payload = bytes(bu)
        assert M.parse_container(payload)["container"] == "bmp"
        media = spark.createDataFrame(
            [(0, "image", payload, w, h, None)], M.MEDIA_SCHEMA
        )
        with pytest.raises(Exception, match="grayscale BMP"):
            M.resize_media(media, 2, 1).collect()
