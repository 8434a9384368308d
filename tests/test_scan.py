"""Scan operator tests — mirror the reference's scan_* integration tests
(FIXTURES F1/F2; reference smoltable/tests/scan_*.rs)."""

from smoltable_spark.api import ColumnFilter, RowRange, ScanInput
from smoltable_spark.operators.scan import scan_cells, scan_rows
from smoltable_spark.operators.assemble import rows_to_json_shape

from tests.conftest import make_cells


def abc_cells(spark):
    # F1 fixture (scan_range_simple.rs / scan_prefix_simple*.rs)
    return make_cells(
        spark,
        [
            ("a", "value", "", 0, "string", "hello"),
            ("b", "value", "", 0, "string", "hello"),
            ("ba", "value", "", 0, "string", "hello2"),
            ("c", "value", "", 0, "string", "hello"),
        ],
    )


def row_keys(df):
    return [r["row_key"] for r in df.select("row_key").distinct().orderBy("row_key").collect()]


def test_scan_all_empty_prefix(spark):
    out = scan_cells(abc_cells(spark), ScanInput(prefix=""))
    assert row_keys(out) == ["a", "b", "ba", "c"]


def test_scan_prefix(spark):
    out = scan_cells(abc_cells(spark), ScanInput(prefix="b"))
    assert row_keys(out) == ["b", "ba"]


def test_scan_range_inclusive(spark):
    # scan_range_simple.rs: range ba..=c → {ba, c}  (note 'b' < 'ba' excluded)
    out = scan_cells(abc_cells(spark), ScanInput(range=RowRange("ba", "c", inclusive=True)))
    assert row_keys(out) == ["ba", "c"]


def test_scan_range_exclusive(spark):
    out = scan_cells(abc_cells(spark), ScanInput(range=RowRange("ba", "c", inclusive=False)))
    assert row_keys(out) == ["ba"]


def test_scan_row_limit(spark):
    # scan_prefix_simple_row_limit.rs: limit 1 over 3-row scan
    out = scan_cells(abc_cells(spark), ScanInput(prefix="", row_limit=2))
    assert row_keys(out) == ["a", "b"]


def test_scan_row_offset(spark):
    out = scan_cells(abc_cells(spark), ScanInput(prefix="", row_offset=1, row_limit=2))
    assert row_keys(out) == ["b", "ba"]


def test_scan_sample_stride(spark):
    # reference accumulator (counter starts 1.0, mod.rs:660,736-746):
    # rate 0.5 over [a,b,ba,c] emits scanned ranks {1,2,4} → a,b,c
    out = scan_cells(abc_cells(spark), ScanInput(prefix="", sample=0.5))
    assert row_keys(out) == ["a", "b", "c"]


def test_scan_sample_with_offset_and_limit(spark):
    # sample and offset both act on scanned rank: rate 0.5 emits {1,2,4};
    # offset 1 drops scanned rank 1 → [b, c]; limit 1 → [b]
    out = scan_cells(
        abc_cells(spark), ScanInput(prefix="", sample=0.5, row_offset=1, row_limit=1)
    )
    assert row_keys(out) == ["b"]


def versions_cells(spark):
    # F2 fixture (read_row_cell_limit.rs): one row, 2 columns × 5 versions
    rows = []
    for qual in ["asd", "def"]:
        for ts in range(1, 6):
            rows.append(("test", "value", qual, ts, "string", f"hello{ts}"))
    return make_cells(spark, rows)


def test_column_cell_limit_newest(spark):
    out = scan_cells(versions_cells(spark), ScanInput(prefix="", column_cell_limit=2))
    got = sorted(
        (r["qualifier"], r["ts"]) for r in out.select("qualifier", "ts").collect()
    )
    assert got == [("asd", 4), ("asd", 5), ("def", 4), ("def", 5)]


def test_row_cell_limit(spark):
    # read_row_cell_limit.rs: 10 cells, budget 7 → asd×5 then def's newest 2
    out = scan_cells(versions_cells(spark), ScanInput(prefix="", row_cell_limit=7))
    assert out.count() == 7
    got = sorted((r["qualifier"], r["ts"]) for r in out.select("qualifier", "ts").collect())
    assert got == [
        ("asd", 1), ("asd", 2), ("asd", 3), ("asd", 4), ("asd", 5),
        ("def", 4), ("def", 5),
    ]


def test_global_cell_limit(spark):
    out = scan_cells(versions_cells(spark), ScanInput(prefix="", cell_limit=3))
    got = [(r["qualifier"], r["ts"]) for r in out.orderBy("qualifier", "ts", ascending=[True, False]).collect()]
    # first 3 cells in (family, qualifier, ts-desc) order: asd 5,4,3
    assert got == [("asd", 5), ("asd", 4), ("asd", 3)]


def test_nested_rows_golden(spark):
    out = scan_rows(abc_cells(spark), ScanInput(prefix="b"))
    golden = [
        {"row_key": "b", "columns": {"value": {"": [{"time": 0, "value": {"string": "hello"}}]}}},
        {"row_key": "ba", "columns": {"value": {"": [{"time": 0, "value": {"string": "hello2"}}]}}},
    ]
    assert rows_to_json_shape(out) == golden


def test_versions_newest_first(spark):
    out = scan_rows(versions_cells(spark), ScanInput(prefix="", column_cell_limit=3))
    shape = rows_to_json_shape(out)
    times = [c["time"] for c in shape[0]["columns"]["value"]["asd"]]
    assert times == [5, 4, 3]


def test_scan_multi_ranges(spark):
    # EXTENSION: disjoint ranges OR'd (reference TODO, query/scan.rs:18-20)
    out = scan_cells(
        abc_cells(spark),
        ScanInput(ranges=(RowRange("a", "a", inclusive=True), RowRange("c", "c", inclusive=True))),
    )
    assert row_keys(out) == ["a", "c"]


def test_scan_ts_window(spark):
    # EXTENSION: time-range cell filter (reference TODO, query/scan.rs:46-51)
    out = scan_cells(versions_cells(spark), ScanInput(prefix="", ts_min=2, ts_max=4))
    got = sorted(set(r["ts"] for r in out.select("ts").collect()))
    assert got == [2, 3, 4]


def test_scan_reverse(spark):
    # EXTENSION: backward scan (unsupported in reference, docs/.../scan-rows.md:189)
    out = scan_rows(abc_cells(spark), ScanInput(prefix="", reverse=True))
    keys = [r["row_key"] for r in out.select("row_key").collect()]
    assert keys == ["c", "ba", "b", "a"]


def test_scan_reverse_row_limit(spark):
    # reverse + limit → last 2 rows in descending order
    out = scan_rows(abc_cells(spark), ScanInput(prefix="", reverse=True, row_limit=2))
    keys = [r["row_key"] for r in out.select("row_key").collect()]
    assert keys == ["c", "ba"]


def test_scan_metrics_observe(spark):
    # SURVEY §4 item 3: cells/bytes/rows scanned via df.observe —
    # read_row_cell_limit.rs asserts scanned=10 even with limit 7
    from pyspark.sql import Observation

    obs = Observation("scan")
    out = scan_cells(versions_cells(spark), ScanInput(prefix="", row_cell_limit=7), observation=obs)
    assert out.count() == 7
    got = obs.get
    assert got["cells_scanned"] == 10
    assert got["rows_scanned"] == 1
    assert got["bytes_scanned"] > 0
