"""smoltable_spark — a PySpark-native wide-column analytics engine.

A from-scratch re-expression of the capabilities of marvin-j97/smoltable
(a Bigtable-style wide-column store; see SURVEY.md) as idiomatic Spark
DataFrame pipelines:

- the canonical data model is a *tall cell table*
  ``(row_key, family, qualifier, ts, vtype, v_*)`` (see ``schema.py``),
- every reference query operator (point reads, prefix/range scans with
  column filters and version limits, counts, deletes, GC) compiles to
  built-in DataFrame combinators (filters, windows, aggregates, limits),
- storage is Parquet partitioned by locality group and sorted by row key,
  so Catalyst's partition pruning and parquet min/max skipping replace the
  reference's LSM seek machinery,
- large-scale training-data extensions (dedup, similarity search, text
  analysis, multimodal plumbing) live in ``functions/``.

Nothing in here is a port of the reference's Rust execution engine; file:line
citations in docstrings point at the *behavior* being reproduced.
"""

from smoltable_spark.session import get_spark
from smoltable_spark.schema import CELLS_SCHEMA, cell_order
from smoltable_spark.api import (
    ColumnFamilyDef,
    ColumnKey,
    ColumnFilter,
    CountInput,
    RowRange,
    ScanInput,
    QueryRowInput,
)
from smoltable_spark.table import Smoltable

__all__ = [
    "get_spark",
    "CELLS_SCHEMA",
    "cell_order",
    "ColumnFamilyDef",
    "ColumnKey",
    "ColumnFilter",
    "CountInput",
    "RowRange",
    "ScanInput",
    "QueryRowInput",
    "Smoltable",
]

__version__ = "0.1.0"
