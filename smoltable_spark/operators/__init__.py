from smoltable_spark.operators.filters import (
    column_filter_expr,
    row_prefix_expr,
    row_range_expr,
)
from smoltable_spark.operators.scan import scan_cells, scan_rows
from smoltable_spark.operators.read import get_row, multi_get
from smoltable_spark.operators.count import count_exact, scan_count, approximate_row_count
from smoltable_spark.operators.assemble import assemble_rows
from smoltable_spark.operators.delete import delete_row
from smoltable_spark.operators.gc import run_version_gc, run_ttl_gc, run_gc

__all__ = [
    "column_filter_expr",
    "row_prefix_expr",
    "row_range_expr",
    "scan_cells",
    "scan_rows",
    "get_row",
    "multi_get",
    "count_exact",
    "scan_count",
    "approximate_row_count",
    "assemble_rows",
    "delete_row",
    "run_version_gc",
    "run_ttl_gc",
    "run_gc",
]
