"""Differential tests for the round-4c operators: each query is checked
against an independent (python or alternative-plan) reference on real
testdata — the same strategy as test_timeseries/test_functions.
"""

import math
from collections import Counter, defaultdict

from pyspark.sql import Window, functions as F

import __spark_entry__ as entry
from smoltable_spark.functions import similarity, text
from smoltable_spark.sources.relational import load_table

HOUR_NS = 3_600_000_000_000
ACTIVE_NS = 30 * 60 * 1_000_000_000


def _events(spark, sf_dir):
    return [
        (r["event_type"], int(r["ts"]), int(r["event_id"]), float(r["value"]))
        for r in load_table(spark, sf_dir, "events").collect()
    ]


def test_ohlc_bars_match_window_reference(spark, sf_dir):
    got = {
        (r["event_type"], r["bucket"]): (
            r["n"], r["open_cents"], r["high_cents"], r["low_cents"], r["close_cents"]
        )
        for r in entry.queries()["rel_ohlc_bars"](spark, sf_dir).collect()
    }
    # independent plan: windowed row_number first/last per bucket
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.expr(f"ts div {HOUR_NS}")
    ).withColumn("c", F.round(F.col("value") * 100).cast("long"))
    wa = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ref_rows = (
        ev.withColumn("ra", F.row_number().over(wa))
        .withColumn("rd", F.row_number().over(wd))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("ra") == 1, F.col("c"))).alias("o"),
            F.max("c").alias("h"),
            F.min("c").alias("l"),
            F.max(F.when(F.col("rd") == 1, F.col("c"))).alias("cl"),
        )
        .collect()
    )
    ref = {
        (r["event_type"], r["bucket"]): (r["n"], r["o"], r["h"], r["l"], r["cl"])
        for r in ref_rows
    }
    assert got == ref


def test_ewma_matches_direct_gather(spark, sf_dir):
    got = {
        (r["event_type"], r["bucket"]): (r["n"], r["ewma_milli"])
        for r in entry.queries()["rel_ewma_hourly"](spark, sf_dir).collect()
    }
    hourly = Counter()
    for et, ts, _eid, _v in _events(spark, sf_dir):
        hourly[(et, ts // HOUR_NS)] += 1
    ref = {}
    for (et, b), n in hourly.items():
        num = sum(
            hourly.get((et, b - k), 0) * (1 << (11 - k)) for k in range(12)
        )
        ref[(et, b)] = (n, 1000 * num // 4095)
    assert got == ref


def test_concurrency_peak_matches_bruteforce(spark, sf_dir):
    got = {
        r["event_type"]: (r["peak"], r["peak_first_t"])
        for r in entry.queries()["rel_concurrency_peak"](spark, sf_dir).collect()
    }
    deltas = defaultdict(Counter)
    for et, ts, _eid, _v in _events(spark, sf_dir):
        deltas[et][ts] += 1
        deltas[et][ts + ACTIVE_NS] -= 1
    ref = {}
    for et, d in deltas.items():
        cum, peak, first_t = 0, -(10**18), None
        for t in sorted(d):
            cum += d[t]
            if cum > peak:
                peak, first_t = cum, t
        ref[et] = (peak, first_t)
    assert got == ref


def test_tfidf_topk_matches_python_reference(spark, sf_dir):
    got = defaultdict(list)
    for r in (
        entry.queries()["txt_tfidf_topk"](spark, sf_dir)
        .orderBy("doc_id", "rk")
        .collect()
    ):
        got[r["doc_id"]].append((r["tok"], r["tf"], r["idf_milli"], r["score"]))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    per_doc = {
        r["doc_id"]: Counter(t for t in r["text"].lower().split(" ") if t)
        for r in docs
    }
    n_docs = len(per_doc)
    df = Counter()
    for c in per_doc.values():
        df.update(c.keys())
    for doc_id, c in per_doc.items():
        scored = sorted(
            (
                (t, tf, math.floor(1000 * math.log(n_docs / df[t])))
                for t, tf in c.items()
            ),
            key=lambda x: (-x[1] * x[2], x[0]),
        )[:5]
        want = [(t, tf, idf, tf * idf) for t, tf, idf in scored]
        assert got.get(doc_id, []) == want, doc_id


def test_range_search_agrees_with_bruteforce_topk(spark, sf_dir):
    rng = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in entry.queries()["ann_range_search"](spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    full = similarity.cosine_topk_bruteforce(
        emb, queries, k=emb.count()
    ).collect()
    above = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in full
        if r["cosine"] >= 0.25
    }
    assert rng == above
    assert all(v >= 0.25 for v in rng.values())


def test_curriculum_stages_partition_corpus(spark, sf_dir):
    rows = {
        r["stage"]: r
        for r in entry.queries()["pipeline_curriculum"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    total = docs.select(
        F.sum(text.token_count(F.col("text")).cast("long")).alias("s")
    ).collect()[0]["s"]
    assert sorted(rows) == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in rows.values()) == n
    assert sum(r["total_tokens"] for r in rows.values()) == total
    # stages are ordered, non-overlapping length bands
    for s in range(3):
        assert rows[s]["max_tokens"] <= rows[s + 1]["min_tokens"]
    # quartile balance: each stage holds 25% ± ties of the corpus
    for s in range(4):
        assert rows[s]["n_docs"] > 0
