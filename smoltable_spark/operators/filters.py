"""Predicate compilation: column filters (P1–P3) and row predicates (P4–P5).

All predicates in the reference apply only to *key coordinates* — row key,
family, qualifier — never to cell values (SURVEY §2.2). Each compiles to a
plain Catalyst ``Column`` expression, so predicate pushdown, partition
pruning (on the ``lg`` column), and parquet min/max row-group skipping are
engaged automatically when the cells table is stored sorted by row key.

Behavior being reproduced:
  - key filter:        reference smoltable/src/cell.rs:214-228
  - multi_key filter:  reference smoltable/src/cell.rs:229-245
  - prefix filter:     reference smoltable/src/cell.rs:246-264
  - row prefix:        reference smoltable/src/table/mod.rs:698-704
  - row range:         reference smoltable/src/table/mod.rs:705-716
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, functions as F

from smoltable_spark.api import ColumnFilter, ColumnKey, RowRange


def _key_expr(k: ColumnKey) -> Column:
    """family == f, and qualifier == q only when a qualifier is given.

    A family-only key matches the whole family, including the '' default
    column (reference cell.rs:216-227). Note '' is a real qualifier and
    compares exactly.
    """
    e = F.col("family") == F.lit(k.family)
    if k.qualifier is not None:
        e = e & (F.col("qualifier") == F.lit(k.qualifier))
    return e


def column_filter_expr(cf: ColumnFilter | None) -> Column:
    """Compile a ColumnFilter to a boolean Column (lit True when None)."""
    if cf is None:
        return F.lit(True)
    if cf.kind == "key":
        return _key_expr(cf.keys[0])
    if cf.kind == "multi_key":
        return reduce(lambda a, b: a | b, (_key_expr(k) for k in cf.keys))
    if cf.kind == "prefix":
        k = cf.keys[0]
        e = F.col("family") == F.lit(k.family)
        if k.qualifier:
            e = e & F.col("qualifier").startswith(F.lit(k.qualifier))
        return e
    raise ValueError(f"unknown column filter kind: {cf.kind}")


def row_prefix_expr(prefix: str) -> Column:
    """Row-key prefix predicate; '' matches everything (full scan).

    ``startswith`` on a sorted parquet column compiles to a sargable
    range — Catalyst pushes ``StringStartsWith`` to the parquet reader,
    which prunes row groups via min/max stats, reproducing the
    reference's seek-to-prefix (reader.rs:46-78) for free.
    """
    if prefix == "":
        return F.lit(True)
    return F.col("row_key").startswith(F.lit(prefix))


def row_range_expr(r: RowRange) -> Column:
    """``start <= row_key <(=) end`` (end-inclusive per flag)."""
    e = F.col("row_key") >= F.lit(r.start)
    if r.inclusive:
        return e & (F.col("row_key") <= F.lit(r.end))
    return e & (F.col("row_key") < F.lit(r.end))


def affected_locality_groups(cf: ColumnFilter | None, family_to_lg: dict[str, str]) -> set[str] | None:
    """Which locality groups a column filter touches; None = all.

    Parity with ``get_affected_locality_groups``
    (reference smoltable/src/table/row_reader.rs:6-69): single/prefix key →
    its family's group; multi_key → union; no filter → all groups. With the
    cells table ``partitionBy('lg')``, Catalyst performs this pruning
    automatically from ``col('lg').isin(...)``; this helper exists for
    explicit pruning + observability parity.
    """
    if cf is None:
        return None
    return {family_to_lg.get(k.family, "") for k in cf.keys}
