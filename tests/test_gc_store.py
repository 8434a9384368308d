"""GC jobs + CellStore lifecycle — mirror gc.rs and the table lifecycle
(S1/S6/S9; FIXTURES F5)."""

import pytest

from smoltable_spark.api import ColumnFamilyDef, ScanInput
from smoltable_spark.operators import count_exact, run_gc, run_ttl_gc, run_version_gc, scan_cells
from smoltable_spark.sources.store import CellStore
from smoltable_spark.sources.writer import rows_to_cells, write_batch

from tests.conftest import make_cells


def gc_fixture(spark):
    # F5: value: 5 versions; temp: young + very old + ts=0 (TTL-exempt)
    rows = [("row", "value", "", ts, "string", f"v{ts}") for ts in range(1, 6)]
    now = 1_000_000_000_000_000_000
    rows += [
        ("row", "temp", "", now - 1_000_000_000, "string", "young"),
        ("row", "temp", "", 5, "string", "ancient"),
        ("row", "temp", "", 0, "string", "exempt"),
    ]
    return make_cells(spark, rows), now


def test_version_gc(spark):
    cells, _ = gc_fixture(spark)
    fams = [ColumnFamilyDef("value", version_limit=3)]
    out = run_version_gc(cells, fams)
    kept = sorted(r["ts"] for r in out.filter("family='value'").collect())
    assert kept == [3, 4, 5]  # newest 3 (gc.rs:30-66)
    assert out.filter("family='temp'").count() == 3  # untouched


def test_ttl_gc_exempts_ts_zero(spark):
    cells, now = gc_fixture(spark)
    fams = [ColumnFamilyDef("temp", ttl_secs=60)]
    out = run_ttl_gc(cells, fams, now_nanos=now)
    temp = sorted(r["ts"] for r in out.filter("family='temp'").collect())
    assert temp == [0, now - 1_000_000_000]  # ancient dropped, ts=0 exempt
    assert out.filter("family='value'").count() == 5


def test_gc_short_circuit(spark):
    cells, now = gc_fixture(spark)
    out = run_gc(cells, [ColumnFamilyDef("value"), ColumnFamilyDef("temp")], now)
    assert out.count() == cells.count()


def test_store_write_read_append_versions(spark, tmp_path):
    store = CellStore(spark, str(tmp_path / "t1"))
    store.save_families(
        [ColumnFamilyDef("value", lg=""), ColumnFamilyDef("temp", lg="lg_hot")]
    )
    cells, _ = gc_fixture(spark)
    v1 = store.write(cells)
    assert v1 == 1
    t = store.read()
    assert t.count() == 8
    # locality-group partition column assigned from the manifest
    # ('' is stored under the physical sentinel '_default')
    assert set(r["lg"] for r in t.select("lg").distinct().collect()) == {
        "_default",
        "lg_hot",
    }
    # append = new snapshot; old version still readable (MVCC)
    v2 = write_batch(
        store,
        [{"row_key": "row2", "cells": [{"column_key": "value:", "value": {"i64": 7}, "timestamp": 9}]}],
    )
    assert v2 == 2
    assert store.read(version=1).count() == 8
    assert store.read().count() == 9


def test_store_gc_rewrite_cycle(spark, tmp_path):
    store = CellStore(spark, str(tmp_path / "t2"))
    fams = [ColumnFamilyDef("value", version_limit=2)]
    store.save_families(fams)
    cells, now = gc_fixture(spark)
    store.write(cells)
    gced = run_gc(store.read().drop("lg"), fams, now_nanos=now)
    v = store.write(gced)
    assert v == 2
    kept = sorted(r["ts"] for r in store.read().filter("family='value'").collect())
    assert kept == [4, 5]
    store.vacuum(keep_last=1)
    with pytest.raises(Exception):
        store.read(version=1).count()


def test_writer_default_timestamp(spark):
    cells = rows_to_cells(
        spark,
        [{"row_key": "r", "cells": [{"column_key": "f:q", "value": {"string": "x"}}]}],
    )
    ts = cells.collect()[0]["ts"]
    assert ts > 1_600_000_000_000_000_000  # now-nanos default (writer.rs:28-33)


def test_scan_over_store_partition_pruning(spark, tmp_path):
    """Family filter on a partitioned store touches only its lg partition
    (S5 parity: get_affected_locality_groups -> Catalyst pruning)."""
    store = CellStore(spark, str(tmp_path / "t3"))
    store.save_families(
        [ColumnFamilyDef("value", lg=""), ColumnFamilyDef("temp", lg="lg_hot")]
    )
    cells, _ = gc_fixture(spark)
    store.write(cells)
    t = store.read()
    pruned = t.filter(t.lg == "lg_hot")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear as a pushed partition predicate
    assert "lg_hot" in plan
    assert pruned.count() == 3


def test_store_delta_append_and_compact(spark, tmp_path):
    """append() writes only the batch (delta snapshot); read() unions the
    chain; compact() folds it into one base (LSM memtable-flush/compaction
    analog — appends must never rewrite the table at scale)."""
    store = CellStore(spark, str(tmp_path / "t4"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    cells, _ = gc_fixture(spark)
    v1 = store.write(cells)            # base: 8 cells
    assert store._kind(v1) == "base"
    batch = make_cells(spark, [("zzz", "value", "", 1, "string", "late")])
    v2 = store.append(batch)           # delta: 1 cell only
    assert store._kind(v2) == "delta"
    # the delta dir holds just the batch — the base was NOT rewritten
    assert spark.read.parquet(store._version_dir(v2)).count() == 1
    assert store.read().count() == 9
    assert store.read(version=1).count() == 8  # MVCC intact
    files_before = store.file_count()
    v3 = store.compact()
    assert store._kind(v3) == "base"
    assert store.read().count() == 9
    assert store.file_count() <= files_before
    # compact of an already-compact store is a no-op
    assert store.compact() == v3


def test_store_vacuum_keeps_delta_chain(spark, tmp_path):
    """vacuum must never delete a base an alive delta still reads."""
    store = CellStore(spark, str(tmp_path / "t5"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    cells, _ = gc_fixture(spark)
    store.write(cells)                                     # v1 base
    store.append(make_cells(spark, [("a2", "value", "", 1, "string", "x")]))  # v2 delta
    store.append(make_cells(spark, [("a3", "value", "", 1, "string", "y")]))  # v3 delta
    store.vacuum(keep_last=1)  # current chain = v1+v2+v3 — all must survive
    assert store.read().count() == 10


def test_compaction_worker_threshold(spark, tmp_path):
    from smoltable_spark.jobs.workers import compaction_worker

    store = CellStore(spark, str(tmp_path / "t6"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    cells, _ = gc_fixture(spark)
    store.write(cells)  # v1 base
    for i in range(3):
        store.append(make_cells(spark, [(f"x{i}", "value", "", 1, "string", "v")]))
    assert compaction_worker(store, max_deltas=8) is None  # 3 < 8: no-op
    for i in range(5):
        store.append(make_cells(spark, [(f"y{i}", "value", "", 1, "string", "v")]))
    v = compaction_worker(store, max_deltas=8)  # 8 deltas → compact
    assert v is not None and store._kind(v) == "base"
    assert store.read().count() == 16


def test_approximate_cell_count_metadata_only(spark, tmp_path):
    """A3: footer-metadata sum == exact count on a clean chain; counts
    shadowed coordinates per occurrence (upper bound) until compact()."""
    store = CellStore(spark, str(tmp_path / "t12"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    cells, _ = gc_fixture(spark)
    store.write(cells)                       # 8 cells
    assert store.approximate_cell_count() == 8
    # shadow one existing coordinate via a delta: approx over-counts (9),
    # exact read sees 8; compaction reconciles
    store.append(make_cells(spark, [("row", "value", "", 5, "string", "rewrite")]))
    assert store.approximate_cell_count() == 9
    assert store.read().count() == 8
    store.compact()
    assert store.approximate_cell_count() == 8


def test_vacuum_delta_only_chain_loses_nothing(spark, tmp_path):
    """ADVICE r1 (high): with no base snapshot (append-only history), every
    delta from v=1 is part of the live chain — vacuum must be a no-op, not
    a silent 3-appends→1-row data loss."""
    store = CellStore(spark, str(tmp_path / "t8"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    for i in range(3):
        store.append(make_cells(spark, [(f"r{i}", "value", "", 1, "string", "v")]))
    store.vacuum(keep_last=1)
    assert store.read().count() == 3  # was 1 before the fix


def test_read_raises_on_missing_leg(spark, tmp_path):
    """A chain with a hole (manual delete / corruption) must raise, never
    silently return partial data."""
    import shutil as _sh

    store = CellStore(spark, str(tmp_path / "t9"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    store.write(make_cells(spark, [("r1", "value", "", 1, "string", "a")]))
    store.append(make_cells(spark, [("r2", "value", "", 1, "string", "b")]))
    store.append(make_cells(spark, [("r3", "value", "", 1, "string", "c")]))
    _sh.rmtree(store._version_dir(2))  # punch a hole mid-chain
    with pytest.raises(FileNotFoundError, match="missing leg"):
        store.read()


def test_within_batch_coordinate_dedup_keeps_last(spark, tmp_path):
    """ADVICE r1: duplicate (row_key, family, qualifier, ts) coordinates
    within ONE batch must collapse to the last occurrence (reference LSM
    key overwrite), for both write() and append()."""
    dup = make_cells(
        spark,
        [
            ("r", "value", "", 5, "string", "first"),
            ("r", "value", "", 5, "string", "second"),
        ],
    ).coalesce(1)  # one partition => monotonic ids follow row order
    store = CellStore(spark, str(tmp_path / "t10"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    store.write(dup)
    got = store.read().collect()
    assert len(got) == 1 and got[0]["v_str"] == "second"
    store2 = CellStore(spark, str(tmp_path / "t11"))
    store2.save_families([ColumnFamilyDef("value", lg="")])
    store2.append(dup)
    got2 = store2.read().collect()
    assert len(got2) == 1 and got2[0]["v_str"] == "second"


def test_delta_rewrite_shadows_same_coordinates(spark, tmp_path):
    """LSM parity: rewriting the exact same cell coordinates in a later
    delta replaces the older value (reference LSM key row:cf:cq:!ts
    overwrites); the prior snapshot still shows the old value (MVCC)."""
    store = CellStore(spark, str(tmp_path / "t7"))
    store.save_families([ColumnFamilyDef("value", lg="")])
    store.write(make_cells(spark, [("r", "value", "", 5, "string", "old")]))
    store.append(make_cells(spark, [("r", "value", "", 5, "string", "new")]))
    cur = store.read().collect()
    assert len(cur) == 1 and cur[0]["v_str"] == "new"
    old = store.read(version=1).collect()
    assert len(old) == 1 and old[0]["v_str"] == "old"
    # distinct coordinates still union normally
    store.append(make_cells(spark, [("r", "value", "", 6, "string", "v6")]))
    assert store.read().count() == 2
    # compaction folds the shadowed state into one base
    store.compact()
    vals = sorted(r["v_str"] for r in store.read().collect())
    assert vals == ["new", "v6"]


def test_store_read_changes_cdc(spark, tmp_path):
    """read_changes: O(changes) feed with within-range shadowing; raises
    across base rewrites; empty range -> empty frame with full schema."""
    from pyspark.sql import functions as F

    store = CellStore(spark, str(tmp_path / "cdc"))
    store.save_families([ColumnFamilyDef("value")])
    cells, _ = gc_fixture(spark)
    v1 = store.write(cells)
    one = cells.limit(1)
    store.append(one.withColumn("v_i64", F.lit(111).cast("long")))
    v3 = store.append(one.withColumn("v_i64", F.lit(222).cast("long")))

    ch = store.read_changes(since_version=v1)
    rows = ch.collect()
    # one coordinate, rewritten twice in range -> newest wins
    assert len(rows) == 1 and rows[0]["v_i64"] == 222
    # empty range keeps the schema
    assert store.read_changes(since_version=v3).count() == 0
    # range crossing the base rewrite (v1) is refused
    with pytest.raises(ValueError, match="base"):
        store.read_changes(since_version=0)
    # compaction is a base rewrite too
    store.compact()
    with pytest.raises(ValueError, match="base"):
        store.read_changes(since_version=v3)
