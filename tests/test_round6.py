"""Round-6 suite: audio screening features, perceptual average-hash
image dedup (exact + banded near-dup channels), and the resize →
re-encode → re-extract roundtrip pins."""

import numpy as np
import pytest

from smoltable_spark.functions import multimodal as M


def _gen_thumb(mid: int, grid: int = 8) -> np.ndarray:
    """Independent model of the 8x8 thumb straight from the GENERATOR
    formulas (never from the decoders): PNG pixels are
    (mid + r*w0 + c) % 256 in logical order; BMP carries the same
    generator bytes but positive-height BMP stores rows bottom-up, so
    after the ADVICE-r6 orientation normalization logical row r reads
    generator row h0-1-r; JPEG pixels are block-constant
    (mid + (r//8)*ceil(w0/8) + c//8) % 256."""
    w0, h0 = 16 + mid % 64, 16 + mid % 48
    r = (np.arange(grid) * h0) // grid
    c = (np.arange(grid) * w0) // grid
    if mid % 12 == 0:
        return (mid + r[:, None] * w0 + c[None, :]) % 256
    if mid % 12 == 6:
        return (mid + (h0 - 1 - r[:, None]) * w0 + c[None, :]) % 256
    bw = (w0 + 7) // 8
    return (mid + (r[:, None] // 8) * bw + (c[None, :] // 8)) % 256


def _pack(bits) -> tuple[int, int]:
    hi = lo = 0
    for j in range(32):
        hi |= int(bits[j]) << (31 - j)
        lo |= int(bits[32 + j]) << (31 - j)
    return hi, lo


def _model_ahash(mid: int) -> tuple[int, int]:
    t = _gen_thumb(mid).astype(np.int64).ravel()
    return _pack((64 * t) > int(t.sum()))


class TestAhashMedia:
    def test_matches_generator_model_all_formats(self, spark):
        """decode -> resample -> binarize -> pack equals the pure
        arithmetic model for PNG (0,12), BMP (6,18) and JPEG (1,3,57)."""
        ids = [0, 12, 6, 18, 3, 9, 57]
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in ids], "doc_id long, text string"
        )
        got = {
            r["media_id"]: (r["ahash_hi"], r["ahash_lo"])
            for r in M.ahash_media(M.synthesize_media(docs)).collect()
        }
        assert set(got) == set(ids)
        for mid in ids:
            assert got[mid] == _model_ahash(mid), mid
        # halves stay inside 32 bits -> BIGINT-portable to any engine
        for hi, lo in got.values():
            assert 0 <= hi < 2**32 and 0 <= lo < 2**32

    def test_exact_dup_ids_collide(self, spark):
        """mid and mid+1536 share dims (lcm(64,48) | 1536) and pixels
        (256 | 1536) -> identical payload content -> identical hash."""
        docs = spark.createDataFrame(
            [(0, "a"), (1536, "b"), (6, "c")], "doc_id long, text string"
        )
        got = {
            r["media_id"]: (r["ahash_hi"], r["ahash_lo"])
            for r in M.ahash_media(M.synthesize_media(docs)).collect()
        }
        assert got[0] == got[1536]
        assert got[0] != got[6]

    def test_non_images_produce_no_rows(self, spark):
        docs = spark.createDataFrame(
            [(1, "audio doc"), (2, "video doc")], "doc_id long, text string"
        )
        assert M.ahash_media(M.synthesize_media(docs)).count() == 0


def _bmp_media(spark, rows):
    """Build a media frame of grayscale BMPs from (media_id, px) pairs."""
    recs = [
        (
            int(mid),
            "image",
            M.bmp_bytes(px.shape[1], px.shape[0], px.astype(np.uint8).tobytes()),
            int(px.shape[1]),
            int(px.shape[0]),
            None,
        )
        for mid, px in rows
    ]
    return spark.createDataFrame(recs, M.MEDIA_SCHEMA)


class TestAhashNearPairs:
    def test_planted_perturbed_clone_found(self, spark):
        """Adversarial recall: a clone with one corrupted sampled pixel
        lands at small nonzero Hamming distance and MUST surface through
        the banded channel (the exact-star channel can't see it)."""
        rng = np.random.RandomState(7)
        base = rng.randint(0, 256, size=(32, 40)).astype(np.uint8)
        clone = base.copy()
        # stored row 31 = logical row 0 after the bottom-up flip, so this
        # pixel is the one sampled at thumb (0,0)
        clone[31, 0] = 255 if base[31, 0] < 128 else 0
        # distinct filler images keep every band bucket under the cap
        fillers = [
            (100 + k, rng.randint(0, 256, size=(24, 24)).astype(np.uint8))
            for k in range(6)
        ]
        media = _bmp_media(spark, [(1, base), (2, clone)] + fillers)
        h = M.ahash_media(media)
        hm = {
            r["media_id"]: (r["ahash_hi"], r["ahash_lo"]) for r in h.collect()
        }
        dist = bin(
            (hm[1][0] ^ hm[2][0]) | ((hm[1][1] ^ hm[2][1]) << 32)
        ).count("1")
        assert 0 < dist <= 3  # genuinely a NEAR (not exact) duplicate
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in M.ahash_near_pairs(h).collect()
        }
        assert pairs.get((1, 2)) == dist

    @staticmethod
    def _bitmask_image(on_bits):
        """8x8 image whose aHash bits are EXACTLY ``on_bits``: with
        pixels in {0, 255} and 1 <= k <= 63 pixels at 255, bit_j =
        (64*p_j > 255k) <=> p_j == 255 — full bit-level hash control
        (an 8x8 source makes the thumb the identity map)."""
        px = np.zeros(64, dtype=np.uint8)
        px[list(on_bits)] = 255
        # bits are defined in LOGICAL bit space; BMP storage is bottom-up,
        # so store the flip — decode normalizes back to the intended rows
        return px.reshape(8, 8)[::-1]

    def test_pigeonhole_exhaustive_at_hamming_3(self, spark):
        """d = 3 with one error in three DIFFERENT bands leaves band 4
        clean — the pair MUST surface (the pigeonhole contract)."""
        base = set(range(8, 28))  # 20 on-bits
        d3 = (base ^ {5}) ^ {21} ^ {37}  # one flip in bands 0, 1, 2
        media = _bmp_media(
            spark,
            [(1, self._bitmask_image(base)), (2, self._bitmask_image(d3))],
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in M.ahash_near_pairs(M.ahash_media(media)).collect()
        }
        assert pairs == {(1, 2): 3}

    def test_band_spread_hamming_4_documented_miss(self, spark):
        """d = 4 with one error in EVERY band dirties all 4 bands: no
        banded candidate, hashes unequal so no star — the structural
        recall bound the docstring documents (and the reason the
        default threshold is bands-1 = 3). Pinned so the bound is a
        contract, not an accident."""
        base = set(range(8, 28))
        d4 = ((base ^ {5}) ^ {21} ^ {37}) ^ {53}  # one flip per band
        media = _bmp_media(
            spark,
            [(1, self._bitmask_image(base)), (2, self._bitmask_image(d4))],
        )
        out = M.ahash_near_pairs(M.ahash_media(media), max_hamming=4).collect()
        assert out == []  # would need a 5th band (or brute force) to find

    def test_hot_exact_family_found_via_star_despite_cap(self, spark):
        """40 identical images blow past max_df=32 in EVERY band, so the
        banded channel drops them entirely — the exact-star channel must
        still emit all 39 (keeper, member) pairs at Hamming 0."""
        px = (np.arange(20 * 20).reshape(20, 20) % 256).astype(np.uint8)
        media = _bmp_media(spark, [(i, px) for i in range(40)])
        pairs = M.ahash_near_pairs(M.ahash_media(media), max_df=32).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert got == {(0, i) for i in range(1, 40)}
        assert all(r["hamming"] == 0 for r in pairs)

    def test_pairs_are_ordered_and_unique(self, spark):
        rng = np.random.RandomState(3)
        media = _bmp_media(
            spark,
            [(i, rng.randint(0, 256, size=(16, 16)).astype(np.uint8))
             for i in range(12)],
        )
        rows = M.ahash_near_pairs(M.ahash_media(media)).collect()
        keys = [(r["id_a"], r["id_b"]) for r in rows]
        assert all(a < b for a, b in keys)
        assert len(keys) == len(set(keys))


class TestAudioFeatures:
    def test_closed_form_all_columns(self, spark):
        """n/peak/zcr/energy/rms all match exact integer arithmetic over
        the PCM generator sample_i = (mid+i) % 256 - 128."""
        ids = [1, 7, 250]  # all % 3 == 1 -> audio
        docs = spark.createDataFrame(
            [(i, f"clip {i}") for i in ids], "doc_id long, text string"
        )
        media = M.synthesize_media(docs)
        got = {r["media_id"]: r for r in M.audio_features(media).collect()}
        assert set(got) == set(ids)
        for mid in ids:
            n = 64 + mid % 192
            s = ((np.arange(n, dtype=np.int64) + mid) % 256) - 128
            r = got[mid]
            assert r["n_samples"] == n
            assert r["peak_abs"] == int(np.abs(s).max())
            assert r["zcr"] == int(((s[:-1] * s[1:]) < 0).sum())
            energy = int((s * s).sum())
            assert r["energy"] == energy
            assert r["rms_amp"] == pytest.approx(
                (energy / n) ** 0.5, rel=0, abs=0
            )

    def test_non_audio_rows_skipped(self, spark):
        docs = spark.createDataFrame(
            [(0, "image doc"), (2, "video doc")], "doc_id long, text string"
        )
        assert M.audio_features(M.synthesize_media(docs)).count() == 0


class TestStreamLateData:
    def test_late_rows_dropped_and_windows_finalized(self, spark, sf_dir):
        """The streamed result must equal the batch aggregate over ONLY
        on-time rows, restricted to watermark-finalized windows — and
        must differ from the all-rows aggregate (i.e. the late rows
        really were offered and really were dropped)."""
        from pyspark.sql import functions as F

        from smoltable_spark.queries_analytics import (
            _LATE_WM_NS,
            ANALYTICS_QUERIES,
        )
        from smoltable_spark.sources.relational import load_table

        HOUR = 3_600_000_000_000
        fn, _oracle = ANALYTICS_QUERIES["stream_late_data"]
        got = {
            (r["event_type"], r["bucket_start_ns"]): r["n_events"]
            for r in fn(spark, "/root/testdata/sf0.001").collect()
        }

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        maxns = ev.agg(F.max("ts")).collect()[0][0]
        wm = (maxns // 1_000_000) * 1_000_000 - _LATE_WM_NS
        late = (F.col("ts") < maxns - 6 * _LATE_WM_NS) & (
            F.col("user_id") % 7 == 3
        )
        n_late = ev.filter(late).count()
        assert n_late > 0  # the fixture genuinely offers late rows

        def agg(df):
            return {
                (r["event_type"], r["bucket"]): r["n"]
                for r in df.withColumn(
                    "bucket", (F.col("ts") - F.col("ts") % HOUR)
                )
                .filter(F.col("bucket") + HOUR <= wm)
                .groupBy("event_type", "bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }

        assert got == agg(ev.filter(~late))  # late rows contributed nothing
        assert got != agg(ev)  # ...and would have been visible otherwise


class TestWireIngest:
    def _parse(self, spark, bodies, **kw):
        from smoltable_spark.sources.wire import cells_from_json_wire

        df = spark.createDataFrame([(b,) for b in bodies], "body string")
        return cells_from_json_wire(df, **kw)

    def test_typed_roundtrip_and_default_ts(self, spark):
        body = (
            '{"items": [{"row_key": "r1", "cells": ['
            '{"column_key": "f:q", "timestamp": 7, "value": {"string": "x"}},'
            '{"column_key": "f:n", "value": {"i64": 5}},'
            '{"column_key": "g:", "value": {"f64": 0.25}},'
            '{"column_key": "famonly", "value": {"boolean": true}}]}]}'
        )
        rows = {
            (r["family"], r["qualifier"]): r
            for r in self._parse(spark, [body], default_ts=99).collect()
        }
        assert rows[("f", "q")]["ts"] == 7
        assert rows[("f", "q")]["v_str"] == "x"
        assert rows[("f", "n")]["ts"] == 99  # absent timestamp -> default
        assert rows[("f", "n")]["v_i64"] == 5
        assert rows[("g", "")]["v_f64"] == 0.25
        # family-only key: qualifier normalizes to "" (reference rule)
        assert rows[("famonly", "")]["vtype"] == "boolean"
        assert rows[("famonly", "")]["v_bool"] is True

    def test_strict_rejects_whole_batch(self, spark):
        good = (
            '{"items": [{"row_key": "r", "cells": '
            '[{"column_key": "f:q", "value": {"i64": 1}}]}]}'
        )
        for bad in (
            '{"items": [{"row_key": "r", "cells": '
            '[{"column_key": "bad key!", "value": {"i64": 1}}]}]}',
            # zero variants
            '{"items": [{"row_key": "r", "cells": [{"column_key": "f:q"}]}]}',
            # AMBIGUOUS: two variants — rows_to_cells raises on the same
            # input, the distributed path must reject it too
            '{"items": [{"row_key": "r", "cells": [{"column_key": "f:q", '
            '"value": {"string": "x", "i64": 7}}]}]}',
            # trailing newline inside the family: $-anchored regexes
            # would let this through (Java $ matches before a final \n)
            '{"items": [{"row_key": "r", "cells": [{"column_key": "f\\n:q", '
            '"value": {"i64": 1}}]}]}',
            "not json at all",
        ):
            with pytest.raises(ValueError, match="wire batch rejected"):
                self._parse(spark, [good, bad]).collect()

    def test_empty_batches_are_valid(self, spark):
        out = self._parse(
            spark,
            ['{"items": []}', '{"items": [{"row_key": "r", "cells": []}]}'],
        )
        assert out.count() == 0  # nothing malformed, nothing ingested

    def test_lenient_mode_drops_only_bad_cells(self, spark):
        body = (
            '{"items": [{"row_key": "r", "cells": ['
            '{"column_key": "f:q", "value": {"i64": 1}},'
            '{"column_key": "bad key!", "value": {"i64": 2}},'
            '{"column_key": "f:two", "value": {"i64": 3, "string": "x"}}]}]}'
        )
        out = self._parse(spark, [body], strict=False).collect()
        assert len(out) == 1 and out[0]["v_i64"] == 1


def test_matryoshka_quantize_slice_commutes():
    """The oracle slices THEN quantizes; the engine quantizes (inside
    with_quantized_norm) a pre-sliced vector. Per-element rounding makes
    the two orders identical — the property the bit-exact cert rests on."""
    import numpy as np

    from smoltable_spark.functions.similarity import QUANT

    rng = np.random.RandomState(11)
    v = rng.randn(64).astype(np.float32)
    quantized_then_sliced = np.round(v.astype(np.float64) * QUANT)[:16]
    sliced_then_quantized = np.round(v[:16].astype(np.float64) * QUANT)
    assert np.array_equal(quantized_then_sliced, sliced_then_quantized)


class TestIvfIncremental:
    def test_append_equals_rebuild_and_preserves_base_files(
        self, spark, sf_dir, tmp_path
    ):
        """Appending under the frozen quantizer must (a) serve results
        bit-identical to a full rebuild, (b) leave every base index file
        untouched on disk (pure file-append, nothing rewritten)."""
        import os

        from pyspark.sql import functions as F

        from smoltable_spark.functions import similarity
        from smoltable_spark.functions.ann_index import append_ivf_index
        from smoltable_spark.sources.relational import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cents = similarity.with_quantized_norm(
            emb.filter(F.col("vec_id") < 8), "embedding"
        ).select(
            F.col("vec_id").alias("cid"),
            F.col("q").alias("cq"),
            F.col("nrm2").alias("cn2"),
        )
        queries = emb.filter(F.col("vec_id") < 5)

        full = str(tmp_path / "full")
        similarity.build_ivf_index(emb, full, centroids=cents)
        want = sorted(
            map(tuple, similarity.query_ivf_index(
                spark, full, queries, k=10, nprobe=2).collect())
        )

        incr = str(tmp_path / "incr")
        similarity.build_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 0), incr, centroids=cents
        )
        before = {
            os.path.join(r, f)
            for r, _d, fs in os.walk(incr)
            for f in fs
            if f.endswith(".parquet")
        }
        append_ivf_index(spark, incr, emb.filter(F.col("vec_id") % 2 == 1))
        after = {
            os.path.join(r, f)
            for r, _d, fs in os.walk(incr)
            for f in fs
            if f.endswith(".parquet")
        }
        assert before < after  # base files intact, new files appended
        # staged publish (ADVICE r6): the dot-prefixed staging dir must
        # be fully consumed and deleted — nothing hidden left behind
        assert not any(".staging" in p for p in after)
        assert not any(".staging" in d for _r, ds, _f in os.walk(incr)
                       for d in ds)
        got = sorted(
            map(tuple, similarity.query_ivf_index(
                spark, incr, queries, k=10, nprobe=2).collect())
        )
        assert got == want  # append ≡ rebuild under the frozen quantizer


class TestZorderLayout:
    def test_morton_bijection_and_covering(self, spark):
        """morton2 (Column) and morton2_py agree, form a bijection over
        [0,8)^2, and the covering set is exactly the box's cells."""
        from pyspark.sql import functions as F

        from smoltable_spark.functions.layout import (
            morton2,
            morton2_py,
            zorder_covering,
        )

        grid = spark.createDataFrame(
            [(a, b) for a in range(8) for b in range(8)], "a int, b int"
        )
        got = {
            (r["a"], r["b"]): r["z"]
            for r in grid.select(
                "a", "b", morton2(F.col("a"), F.col("b")).alias("z")
            ).collect()
        }
        zs = set()
        for (a, b), z in got.items():
            assert z == morton2_py(a, b)
            zs.add(z)
        assert zs == set(range(64))  # bijection onto [0, 64)
        cov = zorder_covering([2, 3, 4], [1, 2, 3, 4, 5])
        assert len(cov) == 15 and cov == sorted(cov)
        assert set(cov) == {morton2_py(a, b) for a in (2, 3, 4)
                            for b in (1, 2, 3, 4, 5)}

    def test_query_matches_unpartitioned_box(self, spark, sf_dir):
        """The pruned read over the z-store must equal the same box
        aggregate over the raw table — pruning may never change results."""
        from pyspark.sql import functions as F

        from smoltable_spark.queries_analytics import (
            _DAY_NS,
            ANALYTICS_QUERIES,
        )
        from smoltable_spark.queries_util import cents
        from smoltable_spark.sources.relational import load_table

        fn, _oracle = ANALYTICS_QUERIES["rel_events_zorder_prune"]
        got = {
            r["event_type"]: (r["n_events"], r["total_cents"])
            for r in fn(spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        day_b = F.expr(f"ts div {_DAY_NS}") % 8
        want = {
            r["event_type"]: (r["n"], r["tc"])
            for r in ev.filter(
                day_b.between(2, 4) & (F.col("user_id") % 8).between(1, 5)
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents(F.col("value"))).alias("tc"),
            )
            .collect()
        }
        assert got == want


class TestResizeRoundtrip:
    def test_registry_query_pins(self, spark, sf_dir):
        from smoltable_spark.queries_analytics import ANALYTICS_QUERIES

        fn, _oracle = ANALYTICS_QUERIES["mm_resize_roundtrip"]
        rows = {r["media_id"]: r for r in fn(spark, sf_dir).collect()}
        assert rows  # sf0.001 corpus is non-empty
        for mid, r in rows.items():
            if r["media_type"] == "image":
                assert (r["width"], r["height"]) == (12, 10)
                w0, h0 = 16 + mid % 64, 16 + mid % 48
                if r["container"] in ("png", "bmp"):
                    iy = (np.arange(10) * h0) // 10
                    ix = (np.arange(12) * w0) // 12
                    exp = ((mid + iy[:, None] * w0 + ix[None, :]) % 256).mean()
                    assert r["mean_luma"] == pytest.approx(exp, rel=0, abs=0)
                else:  # jpeg: quantized re-encode -> nulled on both sides
                    assert r["mean_luma"] is None
            elif r["media_type"] == "audio":
                n = 64 + mid % 192
                assert r["duration_ms"] == n * 20  # passthrough untouched
                assert r["rms_amp"] is not None
