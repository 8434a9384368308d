"""Plan audits: the scale properties every operator must keep.

These tests pin the *physical plan*, not just results — a correct answer
computed with a full scan or an accidental shuffle is a regression at
100 TB even when row counts match.
"""

import pytest
from pyspark.sql import functions as F

from smoltable_spark import plans
from smoltable_spark.api import ColumnFamilyDef, ColumnFilter, ScanInput
from smoltable_spark.operators.scan import scan_cells
from smoltable_spark.queries_core import _orders_store, wc_store_scan_prefix
from smoltable_spark.queries_analytics import rel_tpch_q3, rel_tpch_q5
from smoltable_spark.queries_core import wc_filter_key


def test_store_scan_pushdown(spark, sf_dir):
    df = wc_store_scan_prefix(spark, sf_dir)
    a = plans.audit(df)
    # row-key prefix reaches the parquet reader (LSM-seek equivalent)
    assert any("StringStartsWith(row_key" in f for f in a["pushed_filters"]), a
    # column filter pruned to the family's locality group directory
    assert any("lg_orders" in f for f in a["partition_filters"]), a


def test_store_zorder_scan_partition_pruned(spark, sf_dir):
    """The Z-ordered CellStore box scan must prune at the METADATA level:
    the 15-key Morton covering set appears as a zb partition filter on
    the cell-table scan (VERDICT r6 ask #5 'done' criterion)."""
    from smoltable_spark.queries_core import wc_store_zorder_scan

    df = wc_store_zorder_scan(spark, sf_dir)
    a = plans.audit(df)
    assert any(
        "zb" in f and ("INSET" in f or " IN " in f)
        for f in a["partition_filters"]
    ), a


def test_store_zorder_range_partition_pruned(spark, sf_dir):
    """The RANGE-bucketed variant: a row-key range scan maps to a
    contiguous key-bucket interval x day buckets, visible as a zb
    partition filter — and the exact residual range predicate reaches
    the reader as pushed row_key bounds."""
    from smoltable_spark.queries_core import wc_store_zorder_range

    df = wc_store_zorder_range(spark, sf_dir)
    a = plans.audit(df)
    assert any(
        "zb" in f and ("INSET" in f or " IN " in f)
        for f in a["partition_filters"]
    ), a
    assert any("GreaterThanOrEqual(row_key" in f for f in a["pushed_filters"]), a
    assert any("LessThan(row_key" in f for f in a["pushed_filters"]), a


def test_store_zorder_latest_prunes_key_stripe(spark, sf_dir):
    """'Latest per series in a key range' reads the key-bucket interval
    across ALL time buckets — still a zb partition filter (the stripe a
    pure key layout would read; the z-order layout must not tax
    latest-reads), with the exact range pushed to the reader and newest
    resolved by one max-by-struct aggregate (no window, one shuffle)."""
    from smoltable_spark.queries_core import wc_store_zorder_latest

    df = wc_store_zorder_latest(spark, sf_dir)
    a = plans.audit(df)
    assert any(
        "zb" in f and ("INSET" in f or " IN " in f)
        for f in a["partition_filters"]
    ), a
    assert any("GreaterThanOrEqual(row_key" in f for f in a["pushed_filters"]), a
    assert a["shuffles"] <= 2, a  # partial agg + final agg exchange only


def test_melt_filter_prunes_source_columns(spark, sf_dir):
    """Filtering a literal qualifier on the melt folds away non-matching
    union branches -> the parquet scan reads only the needed columns
    (poor-man's locality groups via constant folding)."""
    df = wc_filter_key(spark, sf_dir)
    schemas = plans.read_schema_columns(df)
    assert schemas, "expected parquet scans in plan"
    for cols in schemas:
        assert "o_orderstatus" not in cols and "o_custkey" not in cols, schemas


def test_tpch_q3_broadcasts_dims_adaptively(spark, sf_dir):
    # forced hints were removed (orders/customer are fact-scale at 100 TB);
    # AQE must still CHOOSE broadcast at this data size — assert the
    # runtime-final adaptive plan, not the static one
    df = rel_tpch_q3(spark, sf_dir)
    df.count()
    assert plans.has_broadcast_join(df), plans.physical_plan(df)


def test_tpch_q5_broadcasts_all_dims_adaptively(spark, sf_dir):
    df = rel_tpch_q5(spark, sf_dir)
    df.count()
    assert plans.has_broadcast_join(df), plans.physical_plan(df)


def test_scan_filters_stay_codegen(spark, sf_dir):
    """Predicate pipeline compiles into whole-stage codegen (no Python)."""
    from smoltable_spark.sources.relational import orders_cells

    df = scan_cells(
        orders_cells(spark, sf_dir),
        ScanInput(prefix="order#0001", column_filter=ColumnFilter.key("o:totalprice")),
    )
    assert plans.whole_stage_codegen_spans(df) >= 1
    assert "BatchEvalPython" not in plans.physical_plan(df)


def test_point_read_pushes_equality(spark, sf_dir):
    store = _orders_store(spark, sf_dir)
    df = store.read().filter(F.col("row_key") == "order#000000000042")
    joined = ",".join(plans.pushed_filters(df))
    assert "EqualTo(row_key,order#000000000042)" in joined


def test_asof_join_single_shuffle_per_side(spark, sf_dir):
    """The as-of join's whole pipeline is one shuffle per side (union →
    window on key) — never a per-key cross product or extra exchange."""
    from smoltable_spark.queries_analytics import rel_asof_join

    df = rel_asof_join(spark, sf_dir)
    assert plans.shuffle_count(df) <= 2, plans.physical_plan(df)


def test_dedup_exact_one_shuffle_no_join(spark, sf_dir):
    from smoltable_spark.queries_analytics import dedup_exact

    df = dedup_exact(spark, sf_dir)
    p = plans.physical_plan(df)
    assert plans.shuffle_count(df) <= 1, p
    assert "Join" not in p  # window rank, not a keeper-id semi-join


def test_sessionize_single_shuffle(spark, sf_dir):
    """lag + running-sum + session aggregate all share one user_id shuffle."""
    from smoltable_spark.queries_analytics import rel_sessionize

    df = rel_sessionize(spark, sf_dir)
    assert plans.shuffle_count(df) <= 1, plans.physical_plan(df)


def test_pipeline_clean_corpus_two_shuffles(spark, sf_dir):
    from smoltable_spark.queries_analytics import pipeline_clean_corpus

    df = pipeline_clean_corpus(spark, sf_dir)
    assert plans.shuffle_count(df) <= 2, plans.physical_plan(df)


def test_sample_scan_has_no_single_partition_window(spark, sf_dir):
    """VERDICT r1: the sample path re-ranked with a partition-less
    Window.orderBy — a one-executor sort of every surviving key at 100 TB.
    The closed-form floor rank replaced it; pin that no global
    (non-partitioned) running-window remains anywhere in the sample plan.
    A partition-less window shows up in the physical plan as a Window/
    WindowGroupLimit whose partition spec is empty — its Exchange is a
    SinglePartition exchange."""
    from smoltable_spark.sources.relational import orders_cells

    df = scan_cells(
        orders_cells(spark, sf_dir),
        ScanInput(prefix="", sample=0.25, row_offset=10, row_limit=50),
    )
    p = plans.physical_plan(df)
    assert "SinglePartition" not in p, p


def test_assemble_rows_single_aggregation_exchange(spark, sf_dir):
    """The nested row assembly must reuse ONE row_key exchange for all
    three grouping levels (plus the final orderBy's range exchange) —
    not re-shuffle per level."""
    from smoltable_spark.operators.scan import scan_rows
    from smoltable_spark.sources.relational import orders_cells

    df = scan_rows(orders_cells(spark, sf_dir), ScanInput(prefix="order#0000000001"))
    assert plans.shuffle_count(df) <= 2, plans.physical_plan(df)


def test_melt_prefix_scan_pushes_key_bounds(spark, sf_dir):
    """The codec-transposed numeric bounds must reach the parquet reader."""
    from smoltable_spark.queries_core import wc_scan_prefix

    pushed = plans.pushed_filters(wc_scan_prefix(spark, sf_dir))
    assert any("GreaterThanOrEqual(o_orderkey" in f for f in pushed), pushed
    assert any("LessThanOrEqual(o_orderkey" in f for f in pushed), pushed


def test_bigram_lm_shuffle_budget(spark, sf_dir):
    """Bigram LM scale contract: count tables reach the scoring join via
    broadcast (never a window over token keys — the skew trap), the c1
    rollup's duplicated c12 stage is deduped by AQE's stage cache at
    runtime (ReusedExchange in the executed plan), and the static plan
    stays within the 10-exchange budget (4 corpus passes × pruned scan +
    spread, two vocab-bounded aggs, vocab distinct, one per-doc agg)."""
    from smoltable_spark.functions.text import bigram_lm_scores
    from smoltable_spark.sources.relational import load_table

    df = bigram_lm_scores(load_table(spark, sf_dir, "documents"))
    a = plans.audit(df)
    assert a["broadcast_join"], plans.physical_plan(df)
    assert a["shuffles"] <= 10, plans.physical_plan(df)
    assert "Window" not in plans.physical_plan(df)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed or "ReusedQueryStage" in executed, executed


def test_semantic_keep_one_no_corpus_all_pairs(spark, sf_dir):
    """Semantic keep-one: pair formation must stay bucketed (join keyed by
    the SRP bucket — no cartesian product in the plan) and the label
    propagation operates on the pair set only."""
    from smoltable_spark.queries_analytics import dedup_semantic_keep_one

    df = dedup_semantic_keep_one(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bm25_single_pass_take_ordered(spark, sf_dir):
    """BM25 scale contract: corpus stats arrive via broadcast (no shuffle
    join), the ranked cut is a distributed TakeOrderedAndProject (never a
    single-partition window/sort), and per-term tf stays in array
    expressions (no explode)."""
    from smoltable_spark.functions.text import bm25_topk
    from smoltable_spark.sources.relational import load_table

    df = bm25_topk(load_table(spark, sf_dir, "documents"), ("scan", "vector"))
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Generate explode" not in plan, plan
    assert "Window" not in plan, plan
    a = plans.audit(df)
    assert a["broadcast_join"], plan


def test_value_index_lookup_prunes(spark, sf_dir):
    """The secondary value index must serve lookups with directory
    pruning on (family, qualifier) and a pushed val-equality — a seek,
    not a scan (sources/index.py)."""
    from smoltable_spark.queries_core import wc_value_index_lookup

    df = wc_value_index_lookup(spark, sf_dir)
    a = plans.audit(df)
    assert any(
        "qualifier" in f and "orderpriority" in f for f in a["partition_filters"]
    ), a["partition_filters"]
    # the audit splits filter lists on commas: EqualTo(val, 1-URGENT)
    # arrives as two adjacent entries
    assert any("EqualTo(val" in f for f in a["pushed_filters"]), a["pushed_filters"]
    assert any("1-URGENT" in f for f in a["pushed_filters"]), a["pushed_filters"]
    assert a["broadcast_join"], a  # key fetch is a broadcast join


def test_tpch_q19_disjunctive_predicate_stays_hash_join(spark, sf_dir):
    """The OR-of-ANDs join predicate must NOT degrade to a nested-loop /
    cartesian join: Catalyst extracts the l_partkey equi-key (hash join +
    residual OR) and CNF conversion pushes the per-side conjuncts into
    both parquet scans."""
    from smoltable_spark.queries_analytics import rel_tpch_q19

    df = rel_tpch_q19(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "HashJoin" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    pf = plans.pushed_filters(df)
    assert any("l_quantity" in f and "Or(" in f for f in pf), pf
    assert any("p_brand" in f and "Or(" in f for f in pf), pf


def test_tpch_q4_exists_is_semi_join(spark, sf_dir):
    """EXISTS decorrelates to LEFT SEMI (probe side streams, no lineitem
    columns materialize) with the ship-after-order residual attached."""
    from smoltable_spark.queries_analytics import rel_tpch_q4

    df = rel_tpch_q4(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "LeftSemi" in plan, plan


def test_pq_adc_corpus_side_reads_no_vectors(spark, sf_dir):
    """ADC scoring joins the (m, code) table against the broadcast lookup
    table — the embedding column must appear in the codes/encode leg only
    once (the encode scan), never in a second corpus-wide scan for
    scoring, and the lut side must be broadcast."""
    from smoltable_spark.queries_analytics import ann_pq_adc

    df = ann_pq_adc(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_tpch_q21_decorrelation_no_cartesian(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must decorrelate into the per-order
    aggregate + equi-joins — never a correlated re-scan (nested loop) of
    lineitem, and the fixed-cardinality dims stay broadcast."""
    from smoltable_spark.queries_analytics import rel_tpch_q21

    df = rel_tpch_q21(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "HashJoin" in plan, plan


def test_tpch_q8_pushes_dim_filters(spark, sf_dir):
    """Q8's part-type and date predicates reach the parquet scans, and
    the dual-role nation joins broadcast."""
    from smoltable_spark.queries_analytics import rel_tpch_q8

    df = rel_tpch_q8(spark, sf_dir)
    pf = plans.pushed_filters(df)
    assert any("p_type" in f for f in pf), pf
    assert plans.has_broadcast_join(df), plans.physical_plan(df)


def test_ann_filtered_topk_prefilters_scan(spark, sf_dir):
    """The metadata predicate must PRE-filter: label = 2 reaches the
    corpus parquet scan (pushdown), not a post-rank filter."""
    from smoltable_spark.queries_analytics import ann_filtered_topk

    df = ann_filtered_topk(spark, sf_dir)
    pf = plans.pushed_filters(df)
    assert any("label" in f for f in pf), pf


def test_hybrid_rrf_legs_take_ordered_no_corpus_shuffle(spark, sf_dir):
    """Both retrieval legs cut to top-k distributively; the fusion join
    happens on ≤100-row sides. The corpus tables must never shuffle on a
    row-identity key — the only exchanges are the legs' stats/top-k."""
    from smoltable_spark.queries_analytics import txt_hybrid_rrf

    df = txt_hybrid_rrf(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_rewrite_plans_md_preserves_header_and_merges(tmp_path, monkeypatch):
    """tools/audit_plans.py --write: the prose header survives, merge
    keeps un-audited rows, replace drops them, writes are atomic (no
    .tmp leftover), and rows follow the given registry order."""
    from tools import audit_plans as AP

    doc = tmp_path / "PLANS.md"
    doc.write_text(
        "# PLANS header\n\nprose with `inline code`\n\n"
        "```\nq_old {\"shuffles\": 9}\nq_b {\"shuffles\": 2}\n```\n"
    )
    monkeypatch.setattr(AP, "PLANS_PATH", str(doc))
    AP.rewrite_plans_md(
        {"q_a": '{"shuffles": 1}'}, order=["q_a", "q_b"], merge=True
    )
    text = doc.read_text()
    assert text.startswith("# PLANS header\n\nprose with `inline code`")
    body = text.split("```")[1].strip().splitlines()
    assert body == ['q_a {"shuffles": 1}', 'q_b {"shuffles": 2}',
                    'q_old {"shuffles": 9}']  # stray rows kept at the end
    AP.rewrite_plans_md(
        {"q_a": '{"shuffles": 0}'}, order=["q_a", "q_b"], merge=False
    )
    body = doc.read_text().split("```")[1].strip().splitlines()
    assert body == ['q_a {"shuffles": 0}']  # replace: un-audited rows drop
    assert not (tmp_path / "PLANS.md.tmp").exists()


def test_topk_windows_push_group_limit(spark, sf_dir):
    """VERDICT r8 ask #2: the accepted global top-k windows
    (tests/test_window_audit.py's "rank<=k" entries) rely on Spark
    pruning the single-partition sort — either LimitPushDownThroughWindow
    (the rank filter becomes a distributed TakeOrderedAndProject feeding
    the tiny window) or WindowGroupLimit (rank filter pushed into the
    sort). Pin that on the canonical case so a Spark-version change
    can't silently reintroduce a full vocab-sized one-executor sort."""
    from smoltable_spark.queries_analytics import txt_vocab_topk

    df = txt_vocab_topk(spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, plan
    # and the window must not be fed by an unpruned SinglePartition sort
    assert "Exchange SinglePartition" not in plan, plan
