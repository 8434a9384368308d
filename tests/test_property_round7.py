"""Hypothesis property suites for the round-7 machinery: the progressive
JPEG codec (bit-exact vs baseline at every refinement depth), the Morton
covering set (exact, not a superset), and the monotone key image behind
range bucketing. No Spark session needed."""

import numpy as np
from hypothesis import given, settings, strategies as st

from smoltable_spark.functions import multimodal as M
from smoltable_spark.functions.layout import morton2_py, zorder_covering
from smoltable_spark.sources.store_layout import _key_image_py


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    al=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_progressive_decode_equals_baseline(w, h, al, seed):
    """For ANY image shape (including single-pixel and non-MCU-aligned)
    and ANY refinement depth, the progressive stream must decode
    bit-identically to the baseline stream of the same pixels — both
    encoders quantize the same forward-DCT coefficients and full
    refinement reconstructs them exactly."""
    px = np.random.RandomState(seed).randint(0, 256, size=(h, w)).astype(
        np.uint8
    )
    base = M.jpeg_decode(M.parse_container(M.jpeg_bytes_pixels(w, h, b"", px)))
    prog = M.jpeg_decode(
        M.parse_container(M.jpeg_bytes_progressive(w, h, b"", px, al=al))
    )
    assert np.array_equal(base, prog)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    al=st.integers(min_value=1, max_value=2),
)
def test_progressive_sparse_blocks_stress_eobn(seed, al):
    """Images with long constant stretches maximize EOBn batching and
    the correction-bit interplay of the refinement scan — still exact."""
    rng = np.random.RandomState(seed)
    px = np.full((16, 48), int(rng.randint(0, 256)), dtype=np.uint8)
    # sprinkle a few non-constant blocks
    for _ in range(int(rng.randint(0, 4))):
        r, c = int(rng.randint(0, 16)), int(rng.randint(0, 48))
        px[r, c] = rng.randint(0, 256)
    base = M.jpeg_decode(
        M.parse_container(M.jpeg_bytes_pixels(48, 16, b"", px))
    )
    prog = M.jpeg_decode(
        M.parse_container(M.jpeg_bytes_progressive(48, 16, b"", px, al=al))
    )
    assert np.array_equal(base, prog)


@settings(max_examples=100, deadline=None)
@given(
    a_lo=st.integers(min_value=0, max_value=7),
    a_n=st.integers(min_value=1, max_value=8),
    b_lo=st.integers(min_value=0, max_value=7),
    b_n=st.integers(min_value=1, max_value=8),
)
def test_zorder_covering_is_exact(a_lo, a_n, b_lo, b_n):
    """The covering set equals EXACTLY the Morton keys whose decoded
    (a, b) cell lies in the box — morton2 is a bijection, so pruning
    reads neither extra partitions nor (fatal) misses one."""
    a_vals = [a for a in range(a_lo, min(8, a_lo + a_n))]
    b_vals = [b for b in range(b_lo, min(8, b_lo + b_n))]
    got = set(zorder_covering(a_vals, b_vals, bits=3))
    want = {
        z for z in range(64)
        if _demorton(z)[0] in a_vals and _demorton(z)[1] in b_vals
    }
    assert got == want
    assert len(got) == len(a_vals) * len(b_vals)


def _demorton(z: int, bits: int = 3) -> tuple[int, int]:
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


def test_demorton_inverts_morton():
    for a in range(8):
        for b in range(8):
            assert _demorton(morton2_py(a, b, 3)) == (a, b)


_KEY_ALPHABET = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789#-_.~"),
    min_size=0, max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(k1=_KEY_ALPHABET, k2=_KEY_ALPHABET)
def test_key_image_monotone(k1, k2):
    """k1 <= k2 ⇒ image(k1) <= image(k2) for single-byte-charset keys —
    the property that makes bucket(lo)..bucket(hi) a covering interval
    for any key range (correctness then rests only on the residual)."""
    lo, hi = sorted([k1, k2])
    assert _key_image_py(lo) <= _key_image_py(hi)
