"""Round 10: CMYK/YCCK (ncomp=4, Adobe APP14) JPEG decode — VERDICT r9
ask #6, the last common real-world codec boundary (scanned PDFs /
print-pipeline images). Fixtures are block-constant DC-only 4:4:4
streams, so the expected RGB is closed-form.
"""

from __future__ import annotations

import numpy as np
import pytest

from smoltable_spark.functions.multimodal import (
    cmyk_block_values,
    jpeg_bytes_cmyk,
    jpeg_decode_color,
    parse_container,
)


def _expected_rgb(mid: int, w: int, h: int, transform: int) -> np.ndarray:
    """Pure-python reference of the decode: replicate block constants to
    pixels, apply the YCCK leg when transform=2, then the inverted-CMYK
    composite R = floor(c*k/255 + .5)."""
    planes = [p.astype(np.float64) for p in cmyk_block_values(mid, w, h)]

    def up(p):
        return np.repeat(np.repeat(p, 8, axis=0), 8, axis=1)[:h, :w]

    p0, p1, p2, p3 = map(up, planes)
    if transform == 2:
        c = np.clip(np.floor(p0 + 1.402 * (p2 - 128) + 0.5), 0, 255)
        m = np.clip(
            np.floor(p0 - 0.344136 * (p1 - 128) - 0.714136 * (p2 - 128) + 0.5),
            0, 255,
        )
        y = np.clip(np.floor(p0 + 1.772 * (p1 - 128) + 0.5), 0, 255)
    else:
        c, m, y = p0, p1, p2
    return np.stack(
        [np.floor(ch * p3 / 255 + 0.5) for ch in (c, m, y)], axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize("transform", [0, 2])
@pytest.mark.parametrize("mid,w,h", [(0, 16, 16), (3, 19, 19), (57, 73, 25)])
def test_cmyk_roundtrip_exact(mid, w, h, transform):
    payload = jpeg_bytes_cmyk(
        w, h, b"content", cmyk_block_values(mid, w, h), transform=transform
    )
    info = parse_container(payload)
    assert info["container"] == "jpeg"
    assert info["ncomp"] == 4
    assert info["adobe_transform"] == transform
    assert info["content"] == b"content"
    rgb = jpeg_decode_color(info)
    assert rgb.shape == (h, w, 3)
    assert np.array_equal(rgb, _expected_rgb(mid, w, h, transform))


def test_app14_absent_reads_none():
    from smoltable_spark.functions.multimodal import (
        color_block_values,
        jpeg_bytes_color,
    )

    payload = jpeg_bytes_color(16, 16, b"x", *color_block_values(0, 16, 16))
    info = parse_container(payload)
    assert info["adobe_transform"] is None
    assert info["ncomp"] == 3  # 3-component path untouched


def test_transform_1_with_4_components_rejected():
    payload = jpeg_bytes_cmyk(
        16, 16, b"x", cmyk_block_values(0, 16, 16), transform=0
    )
    # corrupt the APP14 transform byte to the invalid YCbCr value
    idx = payload.find(b"Adobe") + 5 + 6
    bad = payload[:idx] + b"\x01" + payload[idx + 1 :]
    info = parse_container(bad)
    assert info["adobe_transform"] == 1
    with pytest.raises(ValueError, match="transform=1"):
        jpeg_decode_color(info)


def test_encoder_rejects_bad_transform():
    with pytest.raises(ValueError, match="transform"):
        jpeg_bytes_cmyk(16, 16, b"", cmyk_block_values(0, 16, 16), transform=1)


@pytest.mark.parametrize("transform", [0, 2])
@pytest.mark.parametrize("mid", [0, 57])
def test_progressive_cmyk_matches_baseline(mid, transform):
    """PROGRESSIVE (SOF2) 4-component frames decode bit-identically to
    the baseline encoding of the same block constants — the progressive
    coefficient path is component-count-agnostic, and a DC-only
    interleaved ns=4 scan reconstructs the frame exactly (round 10,
    retiring the last codec gate)."""
    from smoltable_spark.functions.multimodal import (
        jpeg_bytes_progressive_cmyk,
    )

    w, h = 16 + mid % 64, 16 + mid % 48
    blocks = cmyk_block_values(mid, w, h)
    base = jpeg_decode_color(parse_container(
        jpeg_bytes_cmyk(w, h, b"c", blocks, transform=transform)
    ))
    info = parse_container(
        jpeg_bytes_progressive_cmyk(w, h, b"c", blocks, transform=transform)
    )
    assert info["sof_marker"] == 0xC2
    assert info["ncomp"] == 4
    assert info["adobe_transform"] == transform
    assert np.array_equal(jpeg_decode_color(info), base)


def test_cmyk_features_pipeline(spark):
    """End-to-end Arrow pass over synthesized 4-component media: parsed
    ncomp/transform and exact means for one spot-checked image."""
    from smoltable_spark.functions.multimodal import (
        cmyk_features,
        synthesize_cmyk_media,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(12)], "doc_id long, text string"
    )
    out = {r["media_id"]: r for r in cmyk_features(
        synthesize_cmyk_media(docs)
    ).collect()}
    assert set(out) == {0, 3, 6, 9}
    for mid, row in out.items():
        assert row["ncomp"] == 4
        assert row["transform"] == (2 if mid % 2 == 0 else 0)
    mid = 3
    w, h = 16 + mid % 64, 16 + mid % 48
    exp = _expected_rgb(mid, w, h, 0).astype(np.int64)
    assert out[mid]["mean_r"] == exp[..., 0].sum() / (w * h)
    assert out[mid]["mean_g"] == exp[..., 1].sum() / (w * h)
    assert out[mid]["mean_b"] == exp[..., 2].sum() / (w * h)


# ---------------------------------------------------------------------------
# fractional chroma upsampling (VERDICT r9 "what's missing" #4 / the r8
# boundary): floor-map upsample, arbitrary per-component sampling factors


def _ref_rgb_samplings(mid, w, h, samplings):
    """Pure-python reference: block constants -> floor-map sample lookup
    -> T.871, computed per pixel independently of the decoder."""
    from smoltable_spark.functions.multimodal import (
        color_block_values_samplings,
    )

    planes = color_block_values_samplings(mid, w, h, samplings)
    hmax = max(hv[0] for hv in samplings)
    vmax = max(hv[1] for hv in samplings)
    full = []
    for (h_i, v_i), blocks in zip(samplings, planes):
        ys = (np.arange(h) * v_i) // vmax
        xs = (np.arange(w) * h_i) // hmax
        full.append(blocks[np.ix_(ys // 8, xs // 8)].astype(np.float64))
    y, cb, cr = full
    r = np.clip(np.floor(y + 1.402 * (cr - 128) + 0.5), 0, 255)
    g = np.clip(
        np.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5),
        0, 255,
    )
    b = np.clip(np.floor(y + 1.772 * (cb - 128) + 0.5), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize(
    "samplings",
    [
        [(3, 3), (2, 2), (2, 2)],  # 3/2 both axes — the canonical case
        [(3, 1), (2, 1), (2, 1)],  # 3/2 horizontal only
        [(4, 3), (3, 2), (2, 1)],  # mixed ratios incl. 4/3 and 3/2
        [(2, 2), (1, 1), (1, 1)],  # integer control: must stay bit-exact
    ],
)
@pytest.mark.parametrize("mid,w,h", [(0, 16, 16), (33, 49, 25)])
def test_fractional_sampling_roundtrip_exact(mid, w, h, samplings):
    from smoltable_spark.functions.multimodal import (
        color_block_values_samplings,
        jpeg_bytes_color_samplings,
        jpeg_decode_color,
        parse_container,
    )

    payload = jpeg_bytes_color_samplings(
        w, h, b"frac", color_block_values_samplings(mid, w, h, samplings),
        samplings,
    )
    info = parse_container(payload)
    assert info["content"] == b"frac"
    assert info["sof_comps"][0][1] == (samplings[0][0] << 4) | samplings[0][1]
    rgb = jpeg_decode_color(info)
    assert np.array_equal(rgb, _ref_rgb_samplings(mid, w, h, samplings))


def test_floor_map_equals_replication_for_integer_ratios():
    """The generalized upsample must reproduce the old np.repeat path
    bit-for-bit on integer ratios — the invariant that keeps every
    existing 4:2:0/4:2:2/4:4:4 oracle green."""
    from smoltable_spark.functions.multimodal import _upsample_floor

    rng = np.random.default_rng(7)
    for hmax, vmax, h_i, v_i in ((2, 2, 1, 1), (4, 2, 2, 1), (4, 4, 1, 2)):
        w, h = 37, 23
        cw = (w * h_i + hmax - 1) // hmax
        ch = (h * v_i + vmax - 1) // vmax
        plane = rng.integers(0, 256, size=(ch + 3, cw + 3), dtype=np.int64)
        old = np.repeat(
            np.repeat(plane, vmax // v_i, axis=0), hmax // h_i, axis=1
        )[:h, :w]
        new = _upsample_floor(plane, h_i, v_i, hmax, vmax, w, h)
        assert np.array_equal(old, new)


# ---------------------------------------------------------------------------
# 12-bit precision (SOF1 extended sequential) grayscale — the last
# precision boundary: medical / DSLR-intermediate imagery


def test_12bit_roundtrip_exact():
    from smoltable_spark.functions.multimodal import (
        jpeg_bytes_12bit,
        jpeg_decode,
        parse_container,
    )

    rng = np.random.default_rng(5)
    for w, h in ((16, 16), (19, 27), (73, 25)):
        bw, bh = (w + 7) // 8, (h + 7) // 8
        vals = rng.integers(0, 4096, size=(bh, bw), dtype=np.int64)
        info = parse_container(jpeg_bytes_12bit(w, h, b"twelve", vals))
        assert info["precision"] == 12
        assert info["sof_marker"] == 0xC1  # extended sequential
        assert info["content"] == b"twelve"
        # the Pq=1 16-bit DQT parsed to 64 unit entries
        assert len(info["dqt"][0]) == 64 and int(info["dqt"][0][0]) == 1
        img = jpeg_decode(info)
        assert img.dtype == np.uint16
        exp = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:h, :w]
        assert np.array_equal(img, exp.astype(np.uint16))


def test_12bit_extremes_hit_max_dc_categories():
    """Value jumps 0 <-> 4095 produce DC diffs near +/-32760 — Huffman
    categories 15, beyond the 8-bit table's 0..11 range."""
    from smoltable_spark.functions.multimodal import (
        jpeg_bytes_12bit,
        jpeg_decode,
        parse_container,
    )

    vals = np.array([[0, 4095], [4095, 0]], dtype=np.int64)
    img = jpeg_decode(parse_container(jpeg_bytes_12bit(16, 16, b"", vals)))
    assert img[0, 0] == 0 and img[0, 8] == 4095
    assert img[8, 0] == 4095 and img[8, 8] == 0


def test_invalid_dqt_precision_rejected():
    from smoltable_spark.functions.multimodal import (
        jpeg_bytes_12bit,
        parse_container,
    )

    payload = jpeg_bytes_12bit(
        16, 16, b"", np.full((2, 2), 7, dtype=np.int64)
    )
    i = payload.find(b"\xff\xdb") + 4
    bad = payload[:i] + bytes([0x20]) + payload[i + 1 :]  # Pq=2
    with pytest.raises(ValueError, match="DQT precision"):
        parse_container(bad)


@pytest.mark.parametrize("al", [0, 1, 2])
def test_12bit_progressive_roundtrip(al):
    """12-bit PROGRESSIVE (SOF2) frames: the spectral-selection +
    successive-approximation script at precision 12 — category-15 DC
    and size-14 AC tables, level shift 2048. Full refinement must
    reconstruct the same rounded forward-DCT coefficients at every al
    (bit-identical decodes), with error <= 1/sample vs the source
    (unit-quant coefficient rounding only)."""
    from smoltable_spark.functions.multimodal import (
        jpeg_bytes_progressive,
        jpeg_decode,
        parse_container,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 4096, size=(27, 19), dtype=np.uint16)
    info = parse_container(
        jpeg_bytes_progressive(19, 27, b"p12", px, al=al, precision=12)
    )
    assert info["precision"] == 12 and info["sof_marker"] == 0xC2
    got = jpeg_decode(info)
    assert got.dtype == np.uint16
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 1
    base = jpeg_decode(parse_container(
        jpeg_bytes_progressive(19, 27, b"p12", px, al=0, precision=12)
    ))
    assert np.array_equal(got, base)  # refinement reconstructs exactly
