"""Scan — the flagship operator (reference ``Smoltable::scan``).

Reproduces ``smoltable/src/table/mod.rs:630-801`` as a composition of
built-in DataFrame combinators. The reference streams cells in merged key
order and applies, per cell: row predicate → column filter → row accounting
(offset / sample / row limit at row boundaries) → nested insertion under
three cell limits. The equivalent set-oriented pipeline, in the order the
stream semantics imply:

1. ``filter`` row predicate (P4 prefix / P5 range) + column filter (P1–P3)
   — pushed down to the parquet scan by Catalyst.
2. per-column version limit (Q1e): ``row_number`` over
   (row_key, family, qualifier ⟶ ts desc) ≤ N
   (reference mod.rs:638-642,777-779).
3. per-row cell budget (Q1d): ``row_number`` over
   (row_key ⟶ family, qualifier, ts desc) ≤ N (mod.rs:644,766-768).
4. row offset / stride sample / row limit (Q1a/b/f) over the global
   row-key order (mod.rs:724-756) — distributed rank, see ``rank.py``.
5. global cell limit (Q1c): first N cells in total cell order
   (mod.rs:646-650,686-690) — TakeOrderedAndProject, a distributed top-k.

Early termination (Q2) needs no code: range/prefix predicates prune row
groups, and Spark's limits are lazy.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, Window, functions as F

from smoltable_spark.api import ScanInput
from smoltable_spark.schema import cell_order
from smoltable_spark.operators.filters import (
    column_filter_expr,
    row_prefix_expr,
    row_range_expr,
)
from smoltable_spark.operators.rank import ranked_row_keys, top_row_keys
from smoltable_spark.operators.assemble import assemble_rows

#: reference default for unspecified limits (mod.rs:635-650)
U16_MAX = 65_535


def _apply_predicates(cells: DataFrame, inp: ScanInput) -> DataFrame:
    if inp.prefix is not None:
        cells = cells.filter(row_prefix_expr(inp.prefix))
    if inp.range is not None:
        cells = cells.filter(row_range_expr(inp.range))
    if inp.column_filter is not None:
        cells = cells.filter(column_filter_expr(inp.column_filter))
    return cells


def _apply_cell_limits(cells: DataFrame, inp: ScanInput) -> DataFrame:
    if inp.column_cell_limit is not None:
        w = Window.partitionBy("row_key", "family", "qualifier").orderBy(F.col("ts").desc())
        cells = (
            cells.withColumn("_vr", F.row_number().over(w))
            .filter(F.col("_vr") <= inp.column_cell_limit)
            .drop("_vr")
        )
    if inp.row_cell_limit is not None:
        w = Window.partitionBy("row_key").orderBy(
            F.col("family").asc(), F.col("qualifier").asc(), F.col("ts").desc()
        )
        cells = (
            cells.withColumn("_rr", F.row_number().over(w))
            .filter(F.col("_rr") <= inp.row_cell_limit)
            .drop("_rr")
        )
    return cells


def _apply_row_accounting(cells: DataFrame, inp: ScanInput) -> DataFrame:
    """Row offset → stride sample → row limit, over global row-key order.

    Order matches the reference's per-row-boundary accounting
    (mod.rs:724-756): offset skips scanned rows first, sampling strides
    over the remainder, the limit counts emitted rows.
    """
    need_full_rank = inp.sample is not None or (
        inp.row_offset > 0 and inp.row_limit is None
    )
    if not need_full_rank and inp.row_limit is None:
        return cells

    if need_full_rank:
        ranked = ranked_row_keys(cells)
    else:
        # bounded: only the first offset+limit keys matter
        ranked = top_row_keys(cells, inp.row_offset + (inp.row_limit or 0))

    if inp.row_offset:
        ranked = ranked.withColumn("rk", F.col("rk") - F.lit(inp.row_offset)).filter(
            F.col("rk") > 0
        )
    if inp.sample is not None:
        # deterministic fractional stride (reference mod.rs:736-746):
        # accumulate `rate` per row, emit when the accumulator crosses 1.
        # Closed form: emit row i (1-based) iff floor(i*rate) > floor((i-1)*rate).
        rate = float(inp.sample)
        ranked = ranked.filter(
            F.floor(F.col("rk") * F.lit(rate)) > F.floor((F.col("rk") - 1) * F.lit(rate))
        )
        w = Window.orderBy("rk")  # re-rank surviving rows for the limit
        ranked = ranked.withColumn("rk", F.row_number().over(w).cast("long"))
    if inp.row_limit is not None:
        ranked = ranked.filter(F.col("rk") <= inp.row_limit)
    return cells.join(F.broadcast(ranked.select("row_key")), "row_key", "inner")


def scan_cells(cells: DataFrame, inp: ScanInput) -> DataFrame:
    """Run a scan, returning the *flat* matching cells (canonical schema).

    This is the engine-native result; ``scan_rows`` nests it into the
    reference's JSON row shape.
    """
    out = _apply_predicates(cells, inp)
    out = _apply_cell_limits(out, inp)
    out = _apply_row_accounting(out, inp)
    if inp.cell_limit is not None:
        # total cell order then limit → TakeOrderedAndProject (distributed top-k)
        out = out.orderBy(*cell_order()).limit(inp.cell_limit)
    return out


def scan_rows(cells: DataFrame, inp: ScanInput) -> DataFrame:
    """Scan returning nested rows sorted by row key.

    Shape parity with ``Vec<Row>`` (reference smoltable/src/row.rs:5-9):
    one row per row_key with map<family, map<qualifier, array<cell>>>,
    versions newest-first; result ordered by row key (the reference
    collects into a BTreeMap, mod.rs:662,794-795).
    """
    return assemble_rows(scan_cells(cells, inp))
