"""Staleness-proof ledger invariants (no Spark session needed).

The driver's correctness gate checks the first 50 registry entries; the
ledger (tools/oracle_ledger.py) guarantees any query whose source or
oracle changed since its last green oracle check is inside that window.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import oracle_ledger as L


def _registry():
    return L._registry()


def test_every_query_has_a_stamp():
    reg = _registry()
    stamps = L.compute_stamps(reg)
    assert set(stamps) == set(reg)
    assert all(len(s) == 64 for s in stamps.values())


def test_stamps_are_dependency_sensitive():
    """A query's stamp must cover the modules its operators live in —
    e.g. the scan queries depend on operators/scan.py, dedup queries on
    functions/dedup.py — and not collapse to one global engine hash
    (which would force every query into the window on any change)."""
    reg = _registry()
    _, scan_mods = L._fn_sources_and_mods(reg["wc_scan_all"][0])
    _, dedup_mods = L._fn_sources_and_mods(reg["dedup_exact"][0])
    assert any("operators.scan" in m for m in L._closure(scan_mods))
    assert any("functions.dedup" in m for m in L._closure(dedup_mods))
    assert L._closure(scan_mods) != L._closure(dedup_mods)


def test_local_imports_are_captured():
    """Function-local imports (from smoltable_spark.x import y inside the
    body) must contribute to the dependency closure — wc_store_scan_prefix
    imports CellStore locally via its helper."""
    reg = _registry()
    _, mods = L._fn_sources_and_mods(reg["wc_store_scan_prefix"][0])
    assert any("sources.store" in m for m in L._closure(mods))


def test_changed_queries_land_inside_the_window():
    """THE invariant the driver relies on: every stamp-changed (or
    never-stamped) query sits within the first WINDOW entries of the
    order __spark_entry__ publishes."""
    reg = _registry()
    changed = L.changed_queries(reg)
    order = L.window_order(reg)
    assert len(order) == len(reg)
    outside = [n for n in changed if order.index(n) >= L.WINDOW]
    assert not outside, (
        f"changed queries outside the first-{L.WINDOW} window: {outside}; "
        "run tools/check_oracle.py to re-verify and restamp"
    )


def test_entry_registry_order_is_ledger_order():
    import __spark_entry__ as e

    reg = _registry()
    assert list(e.queries().keys()) == L.window_order(reg)


def test_red_rows_outrank_stale_rows_in_window():
    """A query with a non-green row in the LATEST driver round must land
    in the next round's first-50 window even when its stamp is fresh —
    otherwise a red row the driver never re-checks stays red forever
    (rel_moving_window, r3)."""
    red = L.red_in_latest_round()
    if not red:
        return  # nothing red in the latest round — vacuously fine
    order = L.window_order(_registry())
    head = set(order[:L.WINDOW])
    missing = {n for n in red if n in order} - head
    assert not missing, missing


def test_certification_debt_is_changed_union_never_green(monkeypatch):
    """VERDICT r4 ask #6: debt = stamp-changed ∪ never-driver-green,
    each query counted once."""
    merged = {f"q{i}": (None, None) for i in range(5)}
    monkeypatch.setattr(L, "changed_queries", lambda m=None: ["q0", "q1"])
    monkeypatch.setattr(L, "last_green_round", lambda: {"q1": 3, "q2": 2})
    assert L.certification_debt(merged) == ["q0", "q1", "q3", "q4"]


def test_window_check_enforces_debt_budget(tmp_path, monkeypatch, capsys):
    """--window-check must FAIL when the certification debt exceeds
    WINDOW × budget-rounds (debt growth becomes a build error).

    VERDICT r6 finding #1: the old form asserted the LIVE repo has >0
    uncertified queries, which is false in exactly the end-of-round
    drained state the driver ships — so this now plants a synthetic
    ledger (real ledger minus a few stamps → guaranteed debt) instead
    of asserting live-repo debt, and keeps a live-repo run only for
    the rc-0 "debt ok" direction under the default budget."""
    import json

    real = L.load_ledger()
    assert len(real) > 3, "live ledger unexpectedly tiny"
    planted = dict(real)
    for n in list(planted)[:3]:
        del planted[n]  # 3 queries now read as never-stamped → debt ≥ 3
    bad = tmp_path / "ledger.json"
    bad.write_text(json.dumps(planted))
    monkeypatch.setattr(L, "LEDGER_PATH", str(bad))
    monkeypatch.setattr(sys, "argv",
                        ["oracle_ledger.py", "--window-check",
                         "--budget-rounds", "0"])
    rc = L.main()
    out = capsys.readouterr().out
    assert rc == 1 and "certification debt" in out

    # live repo, default budget: must not blow the 2-round budget
    monkeypatch.undo()  # restore the real LEDGER_PATH (and argv)
    monkeypatch.setattr(sys, "argv", ["oracle_ledger.py", "--window-check"])
    rc2 = L.main()
    out2 = capsys.readouterr().out
    assert rc2 == 0 and "debt ok" in out2


def test_coverage_flag_is_dry_run_by_default():
    """VERDICT r4 ask #8: a read-style flag must not mutate COVERAGE.md;
    writing requires the explicit --write."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cov = os.path.join(repo, "COVERAGE.md")
    before = open(cov).read() if os.path.exists(cov) else None
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "oracle_ledger.py"),
         "--coverage"],
        capture_output=True, text=True, cwd=repo,
    )
    after = open(cov).read() if os.path.exists(cov) else None
    assert r.returncode == 0 and "dry-run" in r.stdout
    assert before == after, "--coverage without --write mutated COVERAGE.md"


def test_corrupt_ledger_degrades_to_never_stamped(tmp_path, monkeypatch):
    """A torn/corrupt ORACLE_LEDGER.json must read as {} (every query
    "changed" → --window-check fails loudly), NOT raise — an exception
    here would propagate into __spark_entry__._ordered's silent
    definition-order fallback and the driver would quietly stop
    rotating the certification backlog through its first-50 window."""
    bad = tmp_path / "ledger.json"
    bad.write_text('{"wc_scan_all": {"stamp": "abc", tr')  # torn mid-write
    monkeypatch.setattr(L, "LEDGER_PATH", str(bad))
    assert L.load_ledger() == {}
    merged = {f"q{i}": (None, None) for i in range(4)}
    monkeypatch.setattr(L, "compute_stamps", lambda m=None: {n: "s" for n in merged})
    monkeypatch.setattr(L, "red_in_latest_round", lambda: set())
    monkeypatch.setattr(L, "last_green_round", lambda: {})
    assert set(L.changed_queries(merged)) == set(merged)
    assert L.window_order(merged) == list(merged)  # deterministic, no raise


def test_missing_ledger_means_all_changed(tmp_path, monkeypatch):
    monkeypatch.setattr(L, "LEDGER_PATH", str(tmp_path / "absent.json"))
    assert L.load_ledger() == {}


def test_non_dict_ledger_degrades_to_empty(tmp_path, monkeypatch):
    bad = tmp_path / "ledger.json"
    bad.write_text('["not", "a", "dict"]')
    monkeypatch.setattr(L, "LEDGER_PATH", str(bad))
    assert L.load_ledger() == {}


def test_save_ledger_is_atomic_and_leaves_no_tmp(tmp_path, monkeypatch):
    dest = tmp_path / "ledger.json"
    monkeypatch.setattr(L, "LEDGER_PATH", str(dest))
    L.save_ledger({"q": {"stamp": "s", "sf": "x", "checked_utc": "t"}})
    assert not os.path.exists(str(dest) + ".tmp")
    assert L.load_ledger()["q"]["stamp"] == "s"


def test_non_dict_correctness_files_are_skipped(tmp_path, monkeypatch):
    """A CORRECTNESS_r*.json that parses but is not a dict (or has a
    non-numeric round suffix) must be skipped, not raise through
    window_order into the silent registry-order fallback."""
    (tmp_path / "CORRECTNESS_r01.json").write_text('["not", "a", "dict"]')
    (tmp_path / "CORRECTNESS_rbad.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        '{"q1": {"rows_match": true, "schema_match": true, "hash_match": true},'
        ' "q2": {"rows_match": false, "schema_match": true, "hash_match": true}}'
    )
    monkeypatch.setattr(L, "REPO", str(tmp_path))
    assert L.last_green_round() == {"q1": 2}
    assert L.red_in_latest_round() == {"q2"}


def test_driver_stale_queries_promote_into_midtier(monkeypatch):
    """VERDICT r9 ask #4: a query rewritten AFTER its last driver-green
    round (current stamp != the committed ledger's stamp at that round's
    results commit) must outrank merely-rotating rows, even when a local
    oracle run has since refreshed its stamp — while changed/new rows
    keep the front and non-stale rows go last."""
    merged = {"q_changed": 1, "q_stale": 2, "q_fresh": 3, "q_new": 4}
    stamps = {"q_changed": "s1", "q_stale": "s2", "q_fresh": "s3",
              "q_new": "s4"}
    monkeypatch.setattr(L, "compute_stamps", lambda m=None: stamps)
    # local ledger: all stamped except q_changed (stamp mismatch)
    monkeypatch.setattr(L, "load_ledger", lambda: {
        "q_changed": {"stamp": "OLD"},
        "q_stale": {"stamp": "s2"},
        "q_fresh": {"stamp": "s3"},
        "q_new": {"stamp": "s4"},
    })
    # driver greens: q_changed/q_stale/q_fresh green in r5; q_new never
    monkeypatch.setattr(L, "last_green_round", lambda: {
        "q_changed": 5, "q_stale": 5, "q_fresh": 5,
    })
    monkeypatch.setattr(L, "red_in_latest_round", lambda: set())
    # the committed ledger AT r5: q_stale's stamp differed (rewritten
    # since), q_fresh's matches today's
    monkeypatch.setattr(L, "_ledger_at_driver_round", lambda rnd: {
        "q_changed": {"stamp": "OLD"},
        "q_stale": {"stamp": "r5-era"},
        "q_fresh": {"stamp": "s3"},
    })
    order = L.window_order(merged)
    # tier 0: stamp-changed + never-driver-green; tier 1: driver-stale;
    # tier 2: genuinely untouched since its green row
    assert order.index("q_changed") < order.index("q_stale")
    assert order.index("q_new") < order.index("q_stale")
    assert order.index("q_stale") < order.index("q_fresh")
    # driver_stale is a SUPERSET (stamp vs the round's committed ledger);
    # window_order subtracts the locally-changed set before tiering
    assert L.driver_stale_queries(merged) == ["q_changed", "q_stale"]


def test_driver_stale_fails_open_without_git_history(monkeypatch):
    """No git / no round commit => empty dict from _ledger_at_driver_round
    => nothing promoted, nothing raised (the pre-r10 rotation order)."""
    merged = {"q_a": 1}
    monkeypatch.setattr(L, "compute_stamps", lambda m=None: {"q_a": "s"})
    monkeypatch.setattr(L, "load_ledger", lambda: {"q_a": {"stamp": "s"}})
    monkeypatch.setattr(L, "last_green_round", lambda: {"q_a": 5})
    monkeypatch.setattr(L, "_ledger_at_driver_round", lambda rnd: {})
    assert L.driver_stale_queries(merged) == []
