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
