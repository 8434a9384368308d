"""Static audit: every unpartitioned ``Window`` site must be bounded.

VERDICT r8 ask #1: the single-partition-window ban graduates from the
scan-sample plan pin (``test_plans.py``) to a REPO-WIDE audit.
``Window.orderBy(...)`` without a partition spec (and the degenerate
``Window.partitionBy()``) compile to a SinglePartition exchange: one
executor sorts the window's whole input — fine when that input is
bounded (post-``limit`` rows, a fixed dimension) or prunable (Spark's
WindowGroupLimit pushes a ``rank <= k`` filter into the sort), a
straggler/OOM at the 100 TB design point otherwise.

Mechanics mirror ``test_broadcast_audit.py``: AST-walk the package for
unpartitioned Window constructions; every enclosing function must carry
a justification below saying WHY the window's input does not grow with
the data. The r8-flagged functions (``pipeline_interleave_datasets``,
``rel_percentile_rank`` — both rewritten on ``operators/rank.py``'s
two-phase decomposition, plus ``txt_zipf_fit`` found this round) must
NOT contain one at all, and allowlist entries must not go stale.
"""

from __future__ import annotations

import ast
import os

PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "smoltable_spark"
)

# (module-relative path, enclosing function) -> why the window input is
# bounded. "post-limit" = runs after an explicit .limit(k) / top-k cut;
# "rank<=k" = a rank filter Spark's WindowGroupLimit pushes into the
# sort (pinned in test_plans.py::test_topk_windows_push_group_limit);
# "dimension" = one row per value of a schema-fixed dimension.
BOUNDED_WINDOWS: dict[tuple[str, str], str] = {
    ("operators/rank.py", "top_row_keys"):
        "post-limit: ranks the n rows a TakeOrderedAndProject already "
        "cut (the reference caps n at u16::MAX)",
    ("functions/similarity.py", "kmeans_centroids"):
        "post-limit: seed rows after .limit(n_centroids), a fixed "
        "k-means parameter",
    ("functions/similarity.py", "pq_codebooks"):
        "post-limit: ksub sampled seed rows per subspace, fixed by the "
        "quantizer config",
    ("functions/similarity.py", "rrf_fuse"):
        "post-limit: the fused list after .limit(k), caller-bounded "
        "top-k",
    ("functions/text.py", "pack_split"):
        "dimension: one row per pack bucket — the bounded base-offset "
        "leg of the two-phase cumsum (phase 1 is per-bucket parallel)",
    ("queries_analytics.py", "txt_vocab_topk"):
        "rank<=k: top-k tokens by doc frequency; WindowGroupLimit "
        "prunes the sort to k per partition",
    ("queries_analytics.py", "txt_hybrid_rrf"):
        "rank<=k on the lexical leg + post-limit on the fused list",
    ("queries_analytics.py", "txt_collocations"):
        "rank<=k: top-k bigrams by lift over the post-aggregate "
        "bigram table",
    ("queries_analytics.py", "rel_market_basket"):
        "rank<=k: top-k item pairs by lift, post-aggregate",
    ("queries_analytics.py", "rel_event_path_mining"):
        "rank<=k: top-k 3-step paths by count, post-aggregate",
    ("queries_analytics.py", "emb_outlier_topk"):
        "rank<=k: top-k outlier scores, post-aggregate per-vector "
        "scores",
    ("queries_analytics.py", "rel_chisq_drift"):
        "dimension: one row per event_type (schema-fixed enum) at the "
        "point the grand-total window runs",
    ("queries_analytics.py", "txt_inverted_index_persisted"):
        "rank<=k: top-k postings per probe over the score-ranked "
        "candidate cut",
}

#: functions the r8/r9 verdicts flagged — an unpartitioned window here
#: is a regression, not an allowlist candidate
FORBIDDEN = {
    "pipeline_interleave_datasets",
    "rel_percentile_rank",
    "txt_zipf_fit",
}


def _walk_sites():
    """Yield ((relpath, func), lineno) for every unpartitioned Window
    construction in the package."""
    for root, _dirs, files in os.walk(PKG_DIR):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, PKG_DIR)
            with open(path) as fh:
                src = fh.read()
            if "Window" not in src:
                continue
            tree = ast.parse(src)
            funcs = [
                (n.lineno, n.end_lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]

            def enclosing(line):
                best = None
                for s, e, name in funcs:
                    if s <= line <= e and (best is None or s > best[0]):
                        best = (s, name)
                return best[1] if best else "<module>"

            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "Window"
                ):
                    continue
                attr = node.func.attr
                if attr == "orderBy" or (attr == "partitionBy" and not node.args):
                    yield (rel, enclosing(node.lineno)), node.lineno


def test_every_unpartitioned_window_is_justified():
    sites = dict(_walk_sites())
    unknown = {k: v for k, v in sites.items() if k not in BOUNDED_WINDOWS}
    assert not unknown, (
        "unpartitioned Window sites without a boundedness justification "
        f"(add to BOUNDED_WINDOWS with WHY the input is bounded): {unknown}"
    )


def test_flagged_functions_have_no_unpartitioned_window():
    bad = [k for k, _ in _walk_sites() if k[1] in FORBIDDEN]
    assert not bad, f"verdict-flagged functions regressed to unpartitioned windows: {bad}"


def test_window_allowlist_not_stale():
    sites = set(k for k, _ in _walk_sites())
    stale = [k for k in BOUNDED_WINDOWS if k not in sites]
    assert not stale, f"BOUNDED_WINDOWS entries with no remaining site: {stale}"
