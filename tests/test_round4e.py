"""Differential tests for the round-4e operators (RFM segmentation,
market-basket rules) — python references over real testdata."""

import math

from collections import Counter, defaultdict
from datetime import timezone

import __spark_entry__ as entry
from smoltable_spark.sources.relational import load_table

MS_PER_DAY = 86_400_000


def _q1m(x: float) -> int:
    import math

    return int(math.copysign(math.floor(abs(x * 1_000_000) + 0.5), x))
MAX_ITEMS = 8
MIN_SUPPORT = 3


def _quintile_cuts(values):
    hist = Counter(values)
    n = len(values)
    cuts = []
    for p in (200, 400, 600, 800):
        cum = 0
        cut = None
        for v in sorted(hist):
            cum += hist[v]
            if cum * 1000 >= p * n:
                cut = v
                break
        cuts.append(cut)
    return cuts


def _score(v, cuts):
    for i, c in enumerate(cuts):
        if v <= c:
            return i + 1
    return 5


def test_rfm_segments_match_python(spark, sf_dir):
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): (
            r["n_customers"], r["segment_cents"]
        )
        for r in entry.queries()["rel_rfm_segments"](spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    per_cust = defaultdict(lambda: [0, 0, 0])
    for r in orders:
        ms = int(r["o_orderdate"].replace(tzinfo=timezone.utc).timestamp() * 1000)
        cur = per_cust[r["o_custkey"]]
        cur[0] = max(cur[0], ms // MS_PER_DAY)
        cur[1] += 1
        cur[2] += round(r["o_totalprice"] * 100)
    rec = [v[0] for v in per_cust.values()]
    fre = [v[1] for v in per_cust.values()]
    mon = [v[2] for v in per_cust.values()]
    rc, fc, mc = _quintile_cuts(rec), _quintile_cuts(fre), _quintile_cuts(mon)
    ref = defaultdict(lambda: [0, 0])
    for r_day, f, m in per_cust.values():
        key = (_score(r_day, rc), _score(f, fc), _score(m, mc))
        ref[key][0] += 1
        ref[key][1] += m
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_market_basket_matches_python(spark, sf_dir):
    rows = entry.queries()["rel_market_basket"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = defaultdict(list)
    for r in li:
        orders[r["l_orderkey"]].append(r["l_partkey"])
    baskets = {
        k: sorted(set(v)) for k, v in orders.items() if len(v) <= MAX_ITEMS
    }
    n_orders = len(baskets)
    ca = Counter()
    c12 = Counter()
    for parts in baskets.values():
        ca.update(parts)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                c12[(parts[i], parts[j])] += 1
    scored = [
        (
            pa, pb, c, ca[pa], ca[pb],
            1000 * c // ca[pa], 1000 * c // ca[pb],
            c * n_orders / (ca[pa] * ca[pb]),
        )
        for (pa, pb), c in c12.items()
        if c >= MIN_SUPPORT
    ]
    scored.sort(key=lambda t: (-t[7], t[0], t[1]))
    want = scored[:20]
    assert len(rows) == len(want)
    for r, w in zip(sorted(rows, key=lambda r: r["rk"]), want):
        assert (
            r["pa"], r["pb"], r["c12"], r["ca"], r["cb"],
            r["conf_ab_milli"], r["conf_ba_milli"],
        ) == w[:7]
        assert abs(r["lift"] - w[7]) < 1e-12


def test_token_entropy_matches_python(spark, sf_dir):
    import math

    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy_milli"])
        for r in entry.queries()["txt_token_entropy"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for r in docs:
        toks = [t for t in r["text"].lower().split(" ") if t]
        n = len(toks)
        if n == 0:
            assert got[r["doc_id"]] == (0, 0)
            continue
        s = sum(
            math.floor(1000 * c * math.log(c)) for c in Counter(toks).values()
        )
        ent = (math.floor(1000 * n * math.log(n)) - s) // n
        assert got[r["doc_id"]] == (n, ent), r["doc_id"]
    # sanity: a one-token-repeated doc would score ~0; real docs don't
    assert sum(1 for n, e in got.values() if n > 10 and e > 500) > 0


def test_stream_anomaly_equals_batch(spark, sf_dir):
    batch = {
        r["event_id"]: r["z"]
        for r in entry.queries()["rel_anomaly_zscore"](spark, sf_dir).collect()
    }
    stream = {
        r["event_id"]: r["z"]
        for r in entry.queries()["stream_anomaly_scores"](spark, sf_dir).collect()
    }
    assert set(stream) == set(batch)
    for k, z in stream.items():
        assert z == batch[k]


def test_events_day_prune_partition_filter(spark, sf_dir):
    from smoltable_spark import plans
    from smoltable_spark.queries_analytics import rel_events_day_prune

    df = rel_events_day_prune(spark, sf_dir)
    a = plans.audit(df)
    # the 3-day window must reach the store as a PARTITION filter (file
    # skipping), not a post-scan predicate
    assert any("day" in f for f in a["partition_filters"]), a
    # and the result must equal the raw-table aggregation
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["total_cents"])
        for r in df.collect()
    }
    ev = load_table(spark, sf_dir, "events").collect()
    DAY_NS = 24 * 3600 * 1_000_000_000
    lo = min(r["ts"] // DAY_NS for r in ev)
    ref = defaultdict(lambda: [0, 0])
    for r in ev:
        d = r["ts"] // DAY_NS
        if lo <= d <= lo + 2:
            cur = ref[(r["event_type"], d)]
            cur[0] += 1
            cur[1] += round(r["value"] * 100)
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_events_json_extract_matches_python(spark, sf_dir):
    import json

    got = {
        (r["event_type"], r["k_bucket"]): (
            r["n"], r["sum_k"], r["min_k"], r["max_k"]
        )
        for r in entry.queries()["rel_events_json_extract"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "props").collect()
    ref = {}
    for r in ev:
        k = json.loads(r["props"]).get("k") if r["props"] else None
        if k is None:
            continue
        key = (r["event_type"], k // 10)
        n, s, lo, hi = ref.get(key, (0, 0, k, k))
        ref[key] = (n + 1, s + k, min(lo, k), max(hi, k))
    assert got == ref


def test_event_path_mining_matches_python(spark, sf_dir):
    rows = sorted(
        entry.queries()["rel_event_path_mining"](spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    paths = Counter()
    for seq in by_user.values():
        types = [e for _, _, e in sorted(seq)]
        for i in range(len(types) - 2):
            paths[">".join(types[i : i + 3])] += 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["path"], r["n"]) for r in rows] == want


def test_incremental_rollup_equals_full(spark, sf_dir):
    got = {
        (r["event_type"], r["bucket"]): (r["n_events"], r["total_cents"])
        for r in entry.queries()["rel_incremental_rollup"](spark, sf_dir).collect()
    }
    HOUR_NS = 3_600_000_000_000
    ev = load_table(spark, sf_dir, "events").collect()
    ref = defaultdict(lambda: [0, 0])
    for r in ev:
        cur = ref[(r["event_type"], r["ts"] // HOUR_NS)]
        cur[0] += 1
        cur[1] += round(r["value"] * 100)
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_emb_outlier_topk_matches_python(spark, sf_dir):
    rows = sorted(
        entry.queries()["emb_outlier_topk"](spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    emb = load_table(spark, sf_dir, "embeddings").collect()
    qs = {
        r["vec_id"]: [_q1m(x) for x in r["embedding"]] for r in emb
    }
    dims = len(next(iter(qs.values())))
    n = len(qs)
    s = [0] * dims
    ss = [0] * dims
    for q in qs.values():
        for j, x in enumerate(q):
            s[j] += x
            ss[j] += x * x
    scores = {}
    for vid, q in qs.items():
        acc = 0.0
        for j, x in enumerate(q):
            z = (x - s[j] / n) / math.sqrt((ss[j] - s[j] * s[j] / n) / (n - 1))
            acc += z * z
        scores[vid] = acc
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["vec_id"]) for r in rows] == [v for v, _ in want]
    for r, (_, sc) in zip(rows, want):
        assert abs(r["score"] - sc) < 1e-6


def test_quality_classifier_matches_python_training(spark, sf_dir):
    row = entry.queries()["pipeline_quality_classifier"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("text", "lang").collect()
    STOP = {"the", "and", "a", "of", "to", "in", "is", "it", "for", "on"}
    feats = []
    for r in docs:
        toks = [t for t in r["text"].lower().split(" ") if t]
        n = len(toks)
        f1 = min(n, 1000)
        f2 = math.floor(sum(1 for t in toks if t in STOP) * 1000 / n) if n else 0
        feats.append((f1, f2, 1 if r["lang"] == "en" else 0))
    N = len(feats)
    w = [0.0, 0.0, 0.0]
    for _ in range(3):
        g = [0, 0, 0]
        for f1, f2, y in feats:
            z = w[0] + w[1] * (f1 / 1000.0) + w[2] * (f2 / 1000.0)
            sig = 0.5 + z / (2 * (1 + abs(z)))
            e = sig - y
            g[0] += math.floor(1000000.0 * e)
            g[1] += math.floor(1000000.0 * e * (f1 / 1000.0))
            g[2] += math.floor(1000000.0 * e * (f2 / 1000.0))
        w = [w[j] - g[j] / (1000000.0 * N) for j in range(3)]
    tp = fp = tn = fn = 0
    for f1, f2, y in feats:
        z = w[0] + w[1] * (f1 / 1000.0) + w[2] * (f2 / 1000.0)
        if z >= 0:
            tp, fp = tp + (y == 1), fp + (y == 0)
        else:
            tn, fn = tn + (y == 0), fn + (y == 1)
    assert (row["w0_micro"], row["w1_micro"], row["w2_micro"]) == tuple(
        math.floor(1000000.0 * x) for x in w
    )
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (tp, fp, tn, fn)
    assert row["accuracy_milli"] == (tp + tn) * 1000 // N
    # the trained model must actually separate: better than majority class
    maj = max(sum(1 for *_, y in feats if y), N - sum(1 for *_, y in feats if y))
    assert (tp + tn) >= maj


def test_classifier_gate_consistent_with_training(spark, sf_dir):
    rows = entry.queries()["pipeline_classifier_gate"](spark, sf_dir).collect()
    clf = entry.queries()["pipeline_quality_classifier"](spark, sf_dir).collect()[0]
    n_kept = sum(r["n_kept"] for r in rows)
    n_docs = sum(r["n_docs"] for r in rows)
    # gate keeps exactly the classifier's predicted-positive set
    assert n_kept == clf["tp"] + clf["fp"]
    assert n_docs == clf["tp"] + clf["fp"] + clf["tn"] + clf["fn"]
    for r in rows:
        assert r["kept_milli"] == r["n_kept"] * 1000 // r["n_docs"]
