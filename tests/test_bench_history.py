"""bench.py must survive a truncated driver BENCH record (round-4 ask).

``BENCH_r03.json`` was committed with ``"parsed": null`` (driver tail
truncation), which crashed the r3 judge's bench run at end-of-run with
AttributeError — losing the regression gate and the headline total.  The
loader now treats anything that is not a dict-with-queries as absent and
falls back to BENCH_LOCAL.json (the full record bench.py commits itself).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_load_prev_survives_parsed_null():
    # the committed r3 artifact IS the regression input: parsed == null
    latest = bench._latest_round()
    assert latest is not None
    with open(latest[1]) as fh:
        raw = json.load(fh)
    if raw.get("parsed") is None:
        prev, source = bench._load_prev()
        # must not raise; must either fall back to a real record or to None
        assert prev is None or isinstance(prev.get("queries"), dict)
        if prev is not None:
            assert source == "BENCH_LOCAL.json"


def test_load_prev_prefers_driver_record_when_parseable(tmp_path, monkeypatch):
    here = str(tmp_path)
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: os.path.join(here, "bench.py")
    )
    with open(os.path.join(here, "BENCH_r07.json"), "w") as fh:
        json.dump({"parsed": {"sf": 0.1, "value": 1.0, "queries": {"q": 0.5}}}, fh)
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
        json.dump({"sf": 0.1, "value": 2.0, "queries": {"q": 1.0}}, fh)
    prev, source = bench._load_prev()
    assert source == "BENCH_r07.json"
    assert prev["queries"] == {"q": 0.5}
    # truncated driver record -> local fallback
    with open(os.path.join(here, "BENCH_r08.json"), "w") as fh:
        json.dump({"parsed": None, "tail": "..."}, fh)
    prev, source = bench._load_prev()
    assert source == "BENCH_LOCAL.json"
    assert prev["queries"] == {"q": 1.0}
