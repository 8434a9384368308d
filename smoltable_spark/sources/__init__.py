from smoltable_spark.sources.relational import (
    load_table,
    orders_cells,
    lineitem_cells,
    events_cells,
    TABLE_NAMES,
)
from smoltable_spark.sources.store import CellStore
from smoltable_spark.sources.writer import rows_to_cells, write_batch

__all__ = [
    "load_table",
    "orders_cells",
    "lineitem_cells",
    "events_cells",
    "TABLE_NAMES",
    "CellStore",
    "rows_to_cells",
    "write_batch",
]
