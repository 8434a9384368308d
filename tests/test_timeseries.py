"""As-of join + sessionization (functions/timeseries.py)."""

from smoltable_spark.functions import timeseries


def test_asof_join_backward_inclusive(spark):
    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 25, "t2"), ("B", 5, "t3"), ("A", 3, "t4")],
        "sym string, t long, trade string",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 9, 50.0)],
        "sym string, qt long, px double",
    )
    out = timeseries.asof_join(trades, quotes, on="sym", left_time="t", right_time="qt")
    got = {r["trade"]: (r["qt"], r["px"]) for r in out.collect()}
    assert got == {
        "t1": (10, 101.0),   # inclusive: quote AT t=10 matches
        "t2": (20, 102.0),   # latest at-or-before 25
        "t3": (None, None),  # B has no quote <= 5
        "t4": (None, None),  # before any A quote
    }


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.createDataFrame([("k", i, i) for i in range(10)], "k string, t long, v long")
    right = spark.createDataFrame([("k", 4, "x")], "k string, rt long, tag string")
    out = timeseries.asof_join(left, right, on="k", left_time="t", right_time="rt")
    assert out.count() == 10
    matched = {r["v"]: r["tag"] for r in out.collect()}
    assert all(tag == ("x" if v >= 4 else None) for v, tag in matched.items())


def test_sessionize_gap(spark):
    ev = spark.createDataFrame(
        [("u1", t) for t in [0, 10, 200, 210, 500]] + [("u2", t) for t in [0, 1000]],
        "user string, t long",
    )
    out = timeseries.sessionize(ev, key="user", time_col="t", gap=50)
    got = sorted((r["user"], r["t"], r["session_id"]) for r in out.collect())
    assert got == [
        ("u1", 0, 1), ("u1", 10, 1),
        ("u1", 200, 2), ("u1", 210, 2),
        ("u1", 500, 3),
        ("u2", 0, 1), ("u2", 1000, 2),
    ]


def test_session_stats(spark):
    ev = spark.createDataFrame(
        [("u1", t) for t in [0, 10, 200, 210, 500]], "user string, t long"
    )
    out = timeseries.session_stats(ev, key="user", time_col="t", gap=50)
    got = {
        r["session_id"]: (r["n_events"], r["session_start"], r["session_end"], r["duration"])
        for r in out.collect()
    }
    assert got == {1: (2, 0, 10, 10), 2: (2, 200, 210, 10), 3: (1, 500, 500, 0)}


def test_range_join_buckets(spark):
    # intervals spanning bucket boundaries must still match (explode covers
    # every bucket the interval overlaps)
    left = spark.createDataFrame(
        [("k", 5), ("k", 15), ("k", 25), ("k", 99)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("k", 4, 16, "i1"), ("k", 20, 20, "i2")], "k string, s long, e long, tag string"
    )
    out = timeseries.range_join(
        left, right, on="k", left_time="t", right_start="s", right_end="e", bucket=10
    )
    got = sorted((r["t"], r["tag"]) for r in out.collect())
    assert got == [(5, "i1"), (15, "i1")]  # 25/99 match nothing; i2 covers only t=20


def test_resample_ffill_fills_gaps(spark):
    # key a: obs in buckets 0 and 3 (values 1.0 then 7.0) → buckets 1,2
    # carry 1.0 forward with n_obs=0; in-bucket last wins (t=9 over t=5)
    ev = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 9, 4.0), ("a", 35, 7.0), ("b", 12, 2.0)],
        "k string, t long, v double",
    )
    out = timeseries.resample_ffill(ev, key="k", time_col="t", value_col="v", step=10)
    got = {(r["k"], r["bucket"]): (r["value_ffill"], r["n_obs"]) for r in out.collect()}
    assert got == {
        ("a", 0): (4.0, 2),   # last obs in bucket = max(t) → v=4.0
        ("a", 1): (4.0, 0),
        ("a", 2): (4.0, 0),
        ("a", 3): (7.0, 1),
        ("b", 1): (2.0, 1),
    }


def test_resample_ffill_tie_on_time_takes_max_value(spark):
    ev = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 5, 3.0)], "k string, t long, v double"
    )
    out = timeseries.resample_ffill(ev, key="k", time_col="t", value_col="v", step=10)
    assert out.collect()[0]["value_ffill"] == 3.0


def test_resample_ffill_matches_python_model(spark):
    """Differential: random sparse series vs a direct Python model."""
    import random

    rng = random.Random(11)
    rows = []
    for k in ("a", "b", "c"):
        for _ in range(rng.randint(1, 25)):
            rows.append((k, rng.randint(0, 200), round(rng.uniform(0, 9), 2)))
    # dedupe exact (k, t) collisions to keep the in-bucket tie rule simple
    seen, uniq = set(), []
    for k, t, v in rows:
        if (k, t) not in seen:
            seen.add((k, t))
            uniq.append((k, t, v))
    df = spark.createDataFrame(uniq, "k string, t long, v double").repartition(4)
    out = timeseries.resample_ffill(df, key="k", time_col="t", value_col="v", step=25)
    got = {(r["k"], r["bucket"]): (r["value_ffill"], r["n_obs"]) for r in out.collect()}

    exp = {}
    bykey = {}
    for k, t, v in uniq:
        bykey.setdefault(k, []).append((t, v))
    for k, obs in bykey.items():
        buckets = {}
        for t, v in obs:
            buckets.setdefault(t // 25, []).append((t, v))
        last = None
        for b in range(min(buckets), max(buckets) + 1):
            if b in buckets:
                last = max(buckets[b])[1]  # max (t, v): last-in-bucket, value tiebreak
                exp[(k, b)] = (last, len(buckets[b]))
            else:
                exp[(k, b)] = (last, 0)
    assert got == exp
