"""Row deletes (D1).

Reference ``Smoltable::delete_row`` smoltable/src/table/mod.rs:567-598:
delete all cells of a row, optionally narrowed by a column filter, and
report the number of deleted cells.

On immutable Parquet this is copy-on-write: produce the retained cells as
a new snapshot (the CellStore in ``sources/store.py`` turns that into a new
table version atomically). The reference has a known bug — it deletes from
the default tree only, missing locality groups (mod.rs:591) — which we
deliberately do NOT replicate (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from smoltable_spark.api import ColumnFilter
from smoltable_spark.operators.filters import column_filter_expr


def delete_row(
    cells: DataFrame, row_key: str, column_filter: ColumnFilter | None = None
) -> DataFrame:
    """Return the cells table with the target cells removed."""
    doomed = F.col("row_key") == F.lit(row_key)
    if column_filter is not None:
        doomed = doomed & column_filter_expr(column_filter)
    return cells.filter(~doomed)


def deleted_cell_count(
    cells: DataFrame, row_key: str, column_filter: ColumnFilter | None = None
) -> DataFrame:
    """Count of cells a delete_row would remove (the reference returns this)."""
    doomed = F.col("row_key") == F.lit(row_key)
    if column_filter is not None:
        doomed = doomed & column_filter_expr(column_filter)
    return cells.filter(doomed).agg(F.count(F.lit(1)).alias("deleted_cells"))
