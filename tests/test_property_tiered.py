"""Differential property test for the tiered-compaction chain (VERDICT
r9 ask #8): random interleavings of append / minor_compact / compact /
vacuum against a pure-Python LSM model — the CellStore analog of
test_property_scan's differential model.

Invariants under EVERY interleaving:

- ``read()`` ≡ the model's last-write-wins cell map after each
  maintenance op (a fold/rewrite/reclaim must never change content);
- ``read_changes(since)`` at the end ≡ the shadowed merge of the delta
  batches committed after ``since`` — or the DOCUMENTED raise: a base
  rewrite inside the range, or a straddling minor fold whose original
  delta legs were vacuumed.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from smoltable_spark.api import ColumnFamilyDef
from smoltable_spark.sources.store import CellStore

from tests.conftest import make_cells

KEYS = ["a", "b", "c"]

# an op is ("append", [(row_key, ts), ...]) | ("minor",) | ("compact",)
# | ("vacuum", keep_last)
_batch = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(1, 2)),
    min_size=1,
    max_size=3,
)
_op = st.one_of(
    st.tuples(st.just("append"), _batch),
    st.tuples(st.just("minor")),
    st.tuples(st.just("compact")),
    st.tuples(st.just("vacuum"), st.integers(1, 3)),
)
_ops = st.lists(_op, min_size=1, max_size=6)


def _read_map(store) -> dict:
    snap = store.read_or_none()
    if snap is None:
        return {}
    return {
        (r["row_key"], r["ts"]): r["v_str"] for r in snap.collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_chain_ops_preserve_read_and_changes(spark, tmp_path_factory, ops):
    store = CellStore(
        spark, str(tmp_path_factory.mktemp("prop_tiered") / "store")
    )
    store.save_families([ColumnFamilyDef("f")])

    model: dict = {}          # (row_key, ts) -> value, last write wins
    batches: dict[int, dict] = {}   # version -> that APPEND's cell map
    last_base = 0             # newest base-rewrite version (write/compact)
    seq = 0

    for op in ops:
        if op[0] == "append":
            seq += 1
            cells = {
                (rk, ts): f"v{seq}.{i}" for i, (rk, ts) in enumerate(op[1])
            }
            v = store.append(
                make_cells(
                    spark,
                    [
                        (rk, "f", "", ts, "string", val)
                        for (rk, ts), val in cells.items()
                    ],
                )
            )
            batches[v] = cells
            model.update(cells)
            continue
        before = _read_map(store)
        assert before == model
        if op[0] == "minor":
            store.minor_compact()
        elif op[0] == "compact":
            v = store.compact()
            if store._kind(v) == "base" and v > last_base:
                last_base = v
        else:
            store.vacuum(keep_last=op[1])
        # the maintenance op must be content-invisible
        assert _read_map(store) == model

    assert _read_map(store) == model

    # read_changes(since): expected = shadowed merge of append batches
    # committed after `since`, or the documented raise
    cur = store.current_version()
    if cur == 0:
        return  # nothing ever committed: no change feed to check
    for since in range(0, cur + 1):
        expect: dict = {}
        for v in sorted(batches):
            if v > since:
                expect.update(batches[v])
        # compact() may have produced a base AT a version > since — then
        # the range is not derivable and the call must raise
        base_in_range = last_base > since
        try:
            got = {
                (r["row_key"], r["ts"]): r["v_str"]
                for r in store.read_changes(since).collect()
            }
        except ValueError as e:
            msg = str(e)
            assert (
                ("base rewrite" in msg and base_in_range)
                or "minor compaction" in msg  # straddle + vacuumed originals
            ), msg
            continue
        except FileNotFoundError:
            # whole-range legs vacuumed: acceptable only if vacuum ran
            assert any(o[0] == "vacuum" for o in ops)
            continue
        assert not base_in_range, "base rewrite in range must raise"
        assert got == expect, f"since={since}"
