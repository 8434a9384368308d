"""Round-9 additions: advisor-r8 hardening fixes.

- LONG arithmetic in the incremental-dedup exact-Jaccard verify (int32
  `common * 1000` wrapped for >2.1M-shingle docs under non-ANSI Spark);
- batch-side hot-bucket guard in minhash_dedup_incremental (the
  within-batch self-join is quadratic in batch bucket occupancy);
- descriptive error (not bare IndexError) for truncated progressive
  JPEG streams missing a restart segment.
"""

from __future__ import annotations

import numpy as np
import pytest


# --- truncated progressive JPEG streams ------------------------------------


def test_progressive_dc_scan_missing_restart_segment_raises_valueerror():
    """A truncated progressive stream whose restart segment is missing
    must fail with the same descriptive ValueError as the baseline
    color path, not a bare IndexError (advisor r8)."""
    from smoltable_spark.functions.multimodal import (
        _decode_dc_scan,
        _huff_decode_table,
    )

    # canonical 1-symbol DC table: one code of length 1 for symbol 0
    tab = _huff_decode_table((1,) + (0,) * 15, (0,))
    blocks = [np.zeros(64, dtype=np.int32) for _ in range(4)]
    entries = [(0, b) for b in blocks]
    # dri_units=1 → a restart boundary after every entry, but only ONE
    # entropy segment supplied for four entries
    with pytest.raises(ValueError, match="missing a restart segment"):
        _decode_dc_scan(entries, {0: tab}, [b"\x00\x00"], 1, 0, 0)


def test_progressive_ac_scan_missing_restart_segment_raises_valueerror():
    from smoltable_spark.functions.multimodal import (
        _decode_ac_scan,
        _huff_decode_table,
    )

    # symbol 0x00 = EOB with run length 1 (terminates each block cheaply)
    tab = _huff_decode_table((1,) + (0,) * 15, (0x00,))
    views = [np.zeros(64, dtype=np.int32) for _ in range(4)]
    with pytest.raises(ValueError, match="missing a restart segment"):
        _decode_ac_scan(views, tab, [b"\x00\x00"], 1, 1, 5, 0, 0)


# --- incremental dedup: long math + batch-side guard ------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_incremental_verify_uses_long_arithmetic():
    """The verify predicate must compare in LONG: plan-level pin that no
    32-bit multiply remains (advisor r8 medium — `common * 1000`
    overflows int for >2.1M-shingle docs and silently wraps)."""
    import inspect

    from smoltable_spark.functions import dedup_incremental as di

    src = inspect.getsource(di._verified)
    assert "cast(\"long\")" in src or "cast('long')" in src


def test_incremental_dedup_batch_side_hot_bucket_guard(spark):
    """max_bucket_df must also audit the BATCH side: a boilerplate-heavy
    batch concentrating in one band bucket makes the within-batch
    self-join quadratic with no index involvement (advisor r8)."""
    from smoltable_spark.functions.dedup_incremental import (
        lsh_index,
        minhash_dedup_incremental,
    )

    corpus = _docs(
        spark,
        [("c%03d" % i, f"corpus document number {i} entirely distinct words")
         for i in range(4)],
    )
    index = lsh_index(corpus)
    # identical batch texts → every batch doc lands in the same buckets
    batch = _docs(spark, [("b%03d" % i, "the same boilerplate text repeated")
                          for i in range(6)])
    with pytest.raises(ValueError, match="lsh batch band bucket"):
        minhash_dedup_incremental(index, batch, max_bucket_df=3)
    # and a diverse batch under the cap still passes both guards
    ok = minhash_dedup_incremental(
        index,
        _docs(spark, [("b%03d" % i, f"fresh batch text number {i} unique")
                      for i in range(3)]),
        max_bucket_df=3,
    )
    assert ok.count() == 3


# --- two-phase global rank helpers (VERDICT r8 ask #1) ----------------------


def test_value_min_ranks_matches_sql_rank(spark):
    """value_min_ranks == SQL rank() (ties share the MIN rank) and n ==
    total input rows, on a multiset with heavy ties."""
    import random

    from pyspark.sql import Window, functions as F

    from smoltable_spark.operators.rank import value_min_ranks

    rnd = random.Random(9)
    rows = [(i, rnd.choice([10, 20, 20, 30, 45, 45, 45, 60])) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v int")
    ranks, n = value_min_ranks(df, "v", num_partitions=5)
    assert n == 200
    got = {r["v"]: r["r"] for r in ranks.collect()}
    w = Window.orderBy("v")
    ref = {
        r["v"]: r["r"]
        for r in df.select("v", F.rank().over(w).alias("r")).distinct().collect()
    }
    assert got == ref


def test_ranked_rows_multi_column_ordering(spark):
    """ranked_rows == row_number over (c desc, tok asc), all columns
    kept, across an order that straddles range-partition boundaries."""
    from pyspark.sql import functions as F

    from smoltable_spark.operators.rank import ranked_rows

    rows = [(f"t{i:03d}", (i * 7) % 13) for i in range(100)]
    df = spark.createDataFrame(rows, "tok string, c int")
    out = ranked_rows(
        df, [F.col("c").desc(), F.col("tok").asc()], rk_col="r", num_partitions=6
    )
    got = sorted((r["r"], r["tok"], r["c"]) for r in out.collect())
    ref = sorted(rows, key=lambda t: (-t[1], t[0]))
    assert got == [(i + 1, tok, c) for i, (tok, c) in enumerate(ref)]


# --- single-component HiVi boundary (VERDICT r8 ask #6) ---------------------


def _patch_gray_hivi(payload: bytes, hivi: int) -> bytes:
    """Rewrite the declared sampling byte of a one-component SOF0/SOF2:
    marker(2) + length(2) + precision(1) + h(2) + w(2) + ncomp(1) +
    comp_id(1) puts HiVi at offset +11 from the marker."""
    for marker in (b"\xff\xc0", b"\xff\xc2"):
        i = payload.find(marker)
        if i >= 0:
            assert payload[i + 9] == 1  # ncomp: this helper is gray-only
            return payload[: i + 11] + bytes([hivi]) + payload[i + 12 :]
    raise AssertionError("no SOF marker found")


@pytest.mark.parametrize("hivi", [0x22, 0x21, 0x12])
def test_grayscale_jpeg_decodes_any_declared_hivi(hivi):
    """T.81 A.2.2: every scan of a one-component frame is
    NON-interleaved, and with ncomp=1 Hi=Hmax / Vi=Vmax — so the
    data-unit grid is ceil(w/8) x ceil(h/8) whatever sampling byte the
    encoder declared (grayscale HiVi=0x22 files exist in the wild).
    Closing the last r8 codec boundary: baseline AND progressive
    decodes of a patched-HiVi stream must be bit-identical to the
    1x1 decode, not NotImplementedError."""
    from smoltable_spark.functions import multimodal as M

    rng = np.random.RandomState(hivi)
    w, h = 21, 13
    pixels = rng.randint(0, 256, (h, w)).astype(np.uint8)

    base = M.jpeg_bytes(w, h, b"c", M.jpeg_block_values(7, w, h))
    ref = M.jpeg_decode(M.parse_container(base))
    got = M.jpeg_decode(M.parse_container(_patch_gray_hivi(base, hivi)))
    assert np.array_equal(got, ref)

    prog = M.jpeg_bytes_progressive(w, h, b"c", pixels.tobytes(), al=1)
    ref_p = M.jpeg_decode(M.parse_container(prog))
    got_p = M.jpeg_decode(M.parse_container(_patch_gray_hivi(prog, hivi)))
    assert np.array_equal(got_p, ref_p)
    # (ref_p is NOT compared to `pixels`: the forward DCT of arbitrary
    # pixels roundtrips to ±1 — exactness holds at coefficient level,
    # which got_p == ref_p pins)


def test_grayscale_jpeg_rejects_invalid_hivi():
    from smoltable_spark.functions import multimodal as M

    base = M.jpeg_bytes(16, 16, b"c", M.jpeg_block_values(7, 16, 16))
    with pytest.raises(ValueError, match="invalid sampling"):
        M.jpeg_decode(M.parse_container(_patch_gray_hivi(base, 0x50)))
