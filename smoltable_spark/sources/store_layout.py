"""Z-ordered CellStore layout: 2-D partition pruning on the cell table.

VERDICT r6 ask #5. ``functions/layout.py`` proves the Morton primitive on
a dedicated events store; this wires it into the CellStore itself — the
reference-aligned payoff (SURVEY §4's ts_inv file-skipping note: the
reference keeps an inverted-timestamp component in its LSM key precisely
so "newest versions of a key range" reads skip blocks;
smoltable/src/cell.rs:168-182 builds ``row:cf:cq:!ts`` keys). A plain
CellStore base snapshot partitions by locality group only, so a
"key range AND time window" scan reads every file of the touched
groups however selective the time predicate is. ``ZorderCellStore``
additionally partitions base snapshots by the Morton interleave of two
caller-declared bucket expressions (key bucket × time bucket), so that
scan becomes a metadata-level ``zb IN (covering set)`` partition filter
— the Delta/Iceberg Z-ORDER shape, with the covering set closed-form
from the box bounds (``zorder_covering``), never data-dependent.

Everything else is inherited unchanged: manifest/versioning, delta
appends, compaction (which re-runs through the overridden commit and so
re-z-orders), GC, vacuum. Deltas stay small and unpartitioned-by-zb is
fine for them (LSM: deltas are scanned fully anyway until compaction
folds them into the z-ordered base).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from smoltable_spark.functions.layout import morton2, zorder_covering
from smoltable_spark.sources.store import CellStore


class ZorderCellStore(CellStore):
    """CellStore whose BASE snapshots are additionally partitioned by
    ``zb`` = Morton(a_bucket, b_bucket).

    ``a_bucket`` / ``b_bucket`` are column-expression FACTORIES (called
    with no args, returning a Column over the cell columns) so the store
    can re-derive ``zb`` at every write/compaction; ``bits`` bounds each
    dimension to ``2^bits`` buckets (``4^bits`` partitions total).
    Bucket expressions must be deterministic functions of the cell
    columns — the same contract as a partition column anywhere else."""

    def __init__(self, spark, path: str, a_bucket, b_bucket, bits: int = 3):
        super().__init__(spark, path)
        self._a_bucket = a_bucket
        self._b_bucket = b_bucket
        self._bits = bits

    def _commit_snapshot(self, df: DataFrame, kind: str) -> int:
        zb = morton2(
            self._a_bucket().cast("int"),
            self._b_bucket().cast("int"),
            bits=self._bits,
        )
        df = df.withColumn("zb", zb)
        if kind != "base":
            # deltas commit through the parent path (O(batch) memtable
            # flushes, partitioned by lg only) but CARRY zb as a data
            # column: read() unions legs by name, and box_scan's zb
            # filter then applies to delta rows via row-group stats
            # instead of partition pruning — compaction folds them into
            # the z-ordered base
            return super()._commit_snapshot(df, kind)
        df = (
            df.repartition(F.col("lg"), F.col("zb"))
            .sortWithinPartitions(
                F.col("row_key").asc(),
                F.col("family").asc(),
                F.col("qualifier").asc(),
                F.col("ts").desc(),
            )
        )
        n = self.current_version() + 1
        d = self._version_dir(n)
        w = df.write.mode("overwrite")
        for k, v in self.WRITE_OPTIONS.items():
            w = w.option(k, v)
        w.partitionBy("lg", "zb").parquet(d)
        with open(os.path.join(d, self._KIND_FILE), "w") as fh:
            fh.write(kind)
        self._commit_version(n)  # pointer rename = the commit point
        return n

    def box_scan(
        self, a_values: list[int], b_values: list[int]
    ) -> DataFrame:
        """Read only the partitions whose Morton cell intersects the 2-D
        box ``a_values × b_values``: the covering set is computed
        driver-side by pure arithmetic and pushed down as a ``zb IN``
        literal — plain Catalyst partition pruning, no files opened
        outside the box. Residual exact predicates remain the CALLER's
        job (the covering set is exact because morton2 is a bijection,
        but correctness should not have to trust the covering math)."""
        covering = zorder_covering(a_values, b_values, bits=self._bits)
        return self.read().filter(F.col("zb").isin(covering))
