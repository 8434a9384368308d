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
