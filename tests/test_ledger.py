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
