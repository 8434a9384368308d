"""Distributed JSONL ingest (reference write-payload shape) ≡ driver-side
rows_to_cells on the same items."""

import json

from smoltable_spark.sources.jsonl import ingest_jsonl
from smoltable_spark.sources.writer import rows_to_cells

ITEMS = [
    {
        "row_key": "r1",
        "cells": [
            {"column_key": "value:", "timestamp": 5, "value": {"string": "hello"}},
            {"column_key": "meta:n", "timestamp": 6, "value": {"i64": 42}},
            {"column_key": "meta:f", "value": {"f64": 1.5}},  # no ts → default
        ],
    },
    {
        "row_key": "r2",
        "cells": [
            {"column_key": "value", "timestamp": 1, "value": {"boolean": True}},
        ],
    },
]


def test_jsonl_ingest_matches_driver_path(spark, tmp_path):
    p = tmp_path / "batch.jsonl"
    p.write_text("\n".join(json.dumps(i) for i in ITEMS))
    got = ingest_jsonl(spark, str(p), default_ts=0)
    want = rows_to_cells(spark, ITEMS, default_ts=0)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(got) == key(want)
    assert got.count() == 4


def test_jsonl_column_key_forms(spark, tmp_path):
    p = tmp_path / "keys.jsonl"
    p.write_text(json.dumps(
        {"row_key": "r", "cells": [
            {"column_key": "fam:qual:with:colons", "timestamp": 1, "value": {"i32": 7}},
        ]}
    ))
    row = ingest_jsonl(spark, str(p)).collect()[0]
    assert (row["family"], row["qualifier"]) == ("fam", "qual:with:colons")
    assert row["vtype"] == "i32" and row["v_i32"] == 7


def test_full_migration_loop(spark, tmp_path):
    """Reference-user migration path end to end: dump (JSONL write items)
    → bulk ingest → CellStore → facade scan → JSONL export in the scan
    response shape — the complete switch-over story."""
    import glob

    from smoltable_spark import ColumnFamilyDef, ScanInput, Smoltable

    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(json.dumps(i) for i in ITEMS))

    t = Smoltable.open(spark, str(tmp_path / "migrated"))
    t.create_column_families([ColumnFamilyDef("value"), ColumnFamilyDef("meta")])
    cells = ingest_jsonl(spark, str(p), default_ts=0)
    t.store.append(cells)

    cnt = t.count().collect()[0]
    assert (cnt["row_count"], cnt["cell_count"]) == (2, 4)

    out = str(tmp_path / "roundtrip")
    t.export_jsonl(ScanInput(prefix="r"), out)
    lines = []
    for f in glob.glob(out + "/part-*.json"):
        with open(f) as fh:
            lines += [json.loads(l) for l in fh if l.strip()]
    by_key = {l["row_key"]: l for l in lines}
    assert by_key["r1"]["columns"]["meta"]["n"] == [{"time": 6, "value": {"i64": 42}}]
    assert by_key["r2"]["columns"]["value"][""] == [{"time": 1, "value": {"boolean": True}}]
