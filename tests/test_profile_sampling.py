"""Tests for the round-3 profiling / sampling / retrieval operators:
grouped distributed rank, column profile, key-skew report, stratified
sampling, PII scrub, boolean search."""

import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window, functions as F

from smoltable_spark.functions import profile, sampling, text
from smoltable_spark.operators.rank import grouped_ranked_values


def test_grouped_rank_matches_naive_window(spark):
    random.seed(7)
    rows = [
        (random.choice("abc"), float(random.randint(0, 50)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = grouped_ranked_values(df, "g", "v", num_partitions=6)
    naive = df.withColumn(
        "rk", F.row_number().over(Window.partitionBy("g").orderBy("v"))
    )
    # ties make the (row → rank) map nondeterministic, but the
    # (rank → value) map is deterministic: compare those
    got_m = {(r["g"], r["rk"]): r["v"] for r in got.collect()}
    naive_m = {(r["g"], r["rk"]): r["v"] for r in naive.collect()}
    assert got_m == naive_m


def test_grouped_rank_shuffled_input_same_result(spark):
    rows = [("g%d" % (i % 3), float(i * 7 % 23)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v double")
    a = grouped_ranked_values(df, "g", "v", num_partitions=5)
    b = grouped_ranked_values(df.repartition(11), "g", "v", num_partitions=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (4, "y")], "id long, s string"
    )
    got = {r["col_name"]: r for r in profile.column_profile(df).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 4
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_val"] == "x" and got["s"]["max_val"] == "y"


def test_key_distribution_skew_report(spark):
    # group g1: key k1 ×6, k2 ×2 → n=8, keys=2, max=6, skew=150
    rows = [("g1", "k1")] * 6 + [("g1", "k2")] * 2 + [("g2", "a")] * 3
    df = spark.createDataFrame(rows, "g string, k string")
    got = {r["g"]: r for r in profile.key_distribution(df, "g", "k").collect()}
    assert got["g1"]["max_per_key"] == 6
    assert got["g1"]["hot_key"] == "k1"
    assert got["g1"]["skew_x100"] == 150  # 100*6*2/8
    assert got["g2"]["skew_x100"] == 100  # single key = uniform


def test_stratified_sample_deterministic_and_partition_independent(spark):
    rows = [(i, ["en", "de"][i % 2]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.3, "de": 1.0}
    a = sampling.stratified_sample(df, "lang", "doc_id", rates)
    b = sampling.stratified_sample(df.repartition(13), "lang", "doc_id", rates)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b  # RNG-free: same rows regardless of partitioning
    by_lang = {
        r["lang"]: r["n"]
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["de"] == 200  # rate 1.0 keeps every row
    assert 30 <= by_lang.get("en", 0) <= 90  # ~60 expected at rate 0.3


def test_stratified_default_rate_drops_unknown_strata(spark):
    df = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    assert sampling.stratified_sample(df, "lang", "doc_id", {"en": 1.0}).count() == 0


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@test.org or ping 10.0.0.1, tel 555-0199"),
            (2, "no pii here"),
        ],
        "id long, t string",
    )
    counts = text.pii_counts(F.col("t"))
    got = df.select(
        "id",
        text.pii_scrub(F.col("t")).alias("clean"),
        counts["n_emails"].alias("e"),
        counts["n_ips"].alias("i"),
        counts["n_phones"].alias("p"),
    ).collect()
    r1 = next(r for r in got if r["id"] == 1)
    assert r1["clean"] == "mail me at <EMAIL> or ping <IP>, tel <PHONE>"
    assert (r1["e"], r1["i"], r1["p"]) == (1, 1, 1)
    r2 = next(r for r in got if r["id"] == 2)
    assert r2["clean"] == "no pii here" and r2["e"] == 0


def test_boolean_search_vs_bruteforce(spark):
    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta alpha"),
        (3, "beta gamma"),
        (4, "alpha gamma beta delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in text.boolean_search(df, ["alpha", "beta"]).collect()
    }
    expect = {}
    for did, t in docs:
        toks = t.split()
        if {"alpha", "beta"} <= set(toks):
            expect[did] = sum(toks.count(w) for w in ("alpha", "beta"))
    assert got == expect  # {1: 2, 2: 3, 4: 2}


def test_cap_per_group_matches_naive_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from smoltable_spark.functions.sampling import cap_per_group

    rows = [(f"g{i % 3}", i, float(i * 7 % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, pri double").repartition(7)
    got = {
        (r["g"], r["id"], r["rk"])
        for r in cap_per_group(
            df, group_col="g", order_cols=[F.col("pri"), F.col("id")], k=5
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("pri").asc(), F.col("id").asc())
    naive = {
        (r["g"], r["id"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == naive and len(naive) == 15


# ---------------------------------------------------------------------------
# DSIR importance resampling


def _dsir_docs(spark):
    # target domain: "spark" jargon; off-domain: cooking. The jargon docs
    # must score higher importance when target = is_spark.
    rows = [
        (1, "spark shuffle partitions spark shuffle partitions", True),
        (2, "spark executor memory spark executor memory", True),
        (3, "whisk the eggs and fold the flour gently", False),
        (4, "simmer the onions then add the broth slowly", False),
        (5, "spark shuffle partitions executor memory tuning", False),
        (6, "roast the garlic and season the soup", False),
        (7, "", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def test_dsir_weights_separate_domains(spark):
    """In-domain (target-like) docs must outrank off-domain docs, and the
    empty doc carries exactly weight 0 (not dropped)."""
    docs = _dsir_docs(spark)
    w = {
        r["doc_id"]: r["logw_q"]
        for r in sampling.dsir_log_weights(docs, F.col("tgt")).collect()
    }
    assert set(w) == {1, 2, 3, 4, 5, 6, 7}
    assert w[7] == 0
    # doc 5 shares the target vocabulary without being in the target set —
    # DSIR's whole point is that it still scores high
    for jargon in (1, 2, 5):
        for cooking in (3, 4, 6):
            assert w[jargon] > w[cooking]


def test_dsir_weights_are_deterministic_integers(spark):
    docs = _dsir_docs(spark)
    a = sorted(sampling.dsir_log_weights(docs, F.col("tgt")).collect())
    b = sorted(sampling.dsir_log_weights(docs, F.col("tgt")).collect())
    assert a == b
    assert all(isinstance(r["logw_q"], int) for r in a)


def test_dsir_resample_topk(spark):
    """k=3 picks the three highest Gumbel-perturbed keys; output is keyed
    deterministically and ordered by key desc."""
    docs = _dsir_docs(spark)
    out = sampling.dsir_resample(docs, F.col("tgt"), k=3).collect()
    assert len(out) == 3
    keys = [r["key_q"] for r in out]
    assert keys == sorted(keys, reverse=True)
    again = sampling.dsir_resample(docs, F.col("tgt"), k=3).collect()
    assert out == again


def test_grouped_exact_quantiles_matches_reference(spark):
    """Differential vs a driver-side inverse-CDF on adversarial shapes:
    ties, singleton groups, skewed masses."""
    rows = (
        [("a", v) for v in [1, 1, 1, 2, 3, 100]]
        + [("b", 7)]
        + [("c", v) for v in range(10)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["n"], r["min_val"], r["max_val"], r["p500"], r["p900"], r["p990"])
        for r in profile.grouped_exact_quantiles(df, "g", "v").collect()
    }

    def ref(vals, p):
        vals = sorted(vals)
        n = len(vals)
        for i, x in enumerate(vals, 1):
            if i * 1000 >= p * n:
                return x

    from collections import defaultdict

    byg = defaultdict(list)
    for g, v in rows:
        byg[g].append(v)
    for g, vals in byg.items():
        assert got[g] == (
            len(vals), min(vals), max(vals),
            ref(vals, 500), ref(vals, 900), ref(vals, 990),
        ), g


def test_shuffle_shards_reproducible_partition(spark):
    """Every row lands in exactly one shard with contiguous 1..n
    positions; the assignment is identical across reruns and input
    partitionings."""
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = sampling.shuffle_shards(df, shards=8).collect()
    b = sampling.shuffle_shards(df.repartition(13), shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 200 and len({r["doc_id"] for r in a}) == 200
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # hash balance: no shard holds more than 3x the fair share on n=200
    assert max(len(v) for v in by_shard.values()) < 3 * 200 / 8


def _dsir_reference(rows, buckets=1024, seed="dsir"):
    """Driver-side DSIR weights: same hash, same convention, same
    micro-nat quantization — independent implementation."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(text):
        toks = [t for t in text.lower().split(" ") if t]
        n = len(toks)
        out = []
        for i in range(1, max(n - 1, 1) + 1):
            g = " ".join(toks[i - 1 : i + 1])
            if g:
                out.append(g)
        return out

    cnt = defaultdict(Counter)  # doc -> bucket counts
    tgt_of = {}
    for doc_id, text, tgt in rows:
        tgt_of[doc_id] = tgt
        for g in grams(text):
            cnt[doc_id][md5_long(f"{seed}|{g}") % buckets] += 1
    rb, tb = Counter(), Counter()
    for doc_id, c in cnt.items():
        for b, k in c.items():
            rb[b] += k
            if tgt_of[doc_id]:
                tb[b] += k
    rtot, ttot = sum(rb.values()), sum(tb.values())
    lr = {
        b: math.floor(
            1_000_000
            * (
                math.log((tb[b] + 1.0) / (ttot + float(buckets)))
                - math.log((rb[b] + 1.0) / (rtot + float(buckets)))
            )
        )
        for b in rb
    }
    return {
        doc_id: sum(k * lr[b] for b, k in cnt[doc_id].items())
        for doc_id, _, _ in rows
    } | {doc_id: 0 for doc_id, text, _ in rows if not cnt.get(doc_id)}


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab c", min_size=0, max_size=24),
            st.booleans(),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_dsir_weights_match_reference(spark, doc_specs):
    """Hypothesis differential: the distributed DSIR weights equal an
    independent driver-side implementation on adversarial tiny corpora
    (empty docs, single tokens, repeated grams, all-target/no-target)."""
    rows = [(i, t, tgt) for i, (t, tgt) in enumerate(doc_specs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r["doc_id"]: r["logw_q"]
        for r in sampling.dsir_log_weights(df, F.col("tgt")).collect()
    }
    want = _dsir_reference(rows)
    assert got == want
