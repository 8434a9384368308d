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


# ---------------------------------------------------------------------------
# range-bucketed variant: monotone key buckets from a boundaries sidecar


_KEY_IMAGE_BYTES = 7  # 7 big-endian bytes < 2^56: no signed-long overflow


def _key_image_col(col) -> "F.Column":
    """Monotone numeric image of a row key: its first 7 bytes packed
    big-endian into a long. For single-byte-charset keys (the store's
    identifier charset is ASCII) ``k1 < k2 ⇒ image(k1) <= image(k2)``,
    which is all monotone bucketing needs. Pure JVM expressions — the
    image is computed inside the scan/write stage, never in Python."""
    img = F.lit(0).cast("long")
    for i in range(_KEY_IMAGE_BYTES):
        c = F.when(
            F.length(col) > i, F.ascii(F.substring(col, i + 1, 1))
        ).otherwise(F.lit(0))
        img = img * 256 + c
    return img


def _key_image_py(key: str) -> int:
    b = key.encode("utf-8")[:_KEY_IMAGE_BYTES]
    return int.from_bytes(b.ljust(_KEY_IMAGE_BYTES, b"\0"), "big")


class RangeZorderCellStore(ZorderCellStore):
    """ZorderCellStore whose KEY dimension buckets by RANGE, not residue:
    bucket = #(boundaries <= key image), with the 2^bits − 1 boundaries
    estimated from the first base batch (``percentile_approx`` over the
    key image — partition-parallel, no global sort) and persisted in an
    underscore-prefixed sidecar next to the manifest.

    The design invariant that keeps this scale-safe: CORRECTNESS NEVER
    DEPENDS ON THE BOUNDARIES. ``key_range_scan`` computes its covering
    set from the same stored boundaries the writer used, so the covering
    is a superset of the range by monotonicity, and the residual
    ``lo <= row_key < hi`` predicate (always applied) makes the result
    exact whatever the boundary quality — skewed or approximate
    boundaries cost read amplification, never wrong answers. That is
    exactly Delta/Iceberg's Z-ORDER contract (layout is advisory;
    predicates decide)."""

    def __init__(self, spark, path: str, b_bucket, bits: int = 3):
        super().__init__(
            spark, path, a_bucket=self._key_bucket, b_bucket=b_bucket,
            bits=bits,
        )
        self._boundaries_cache: list[int] | None = None

    # -- boundaries sidecar ------------------------------------------------

    @property
    def _boundaries_path(self) -> str:
        return os.path.join(self.path, "_layout_boundaries")

    def _load_boundaries(self) -> list[int]:
        if self._boundaries_cache is None:
            rows = self.spark.read.parquet(self._boundaries_path).collect()
            self._boundaries_cache = sorted(r["boundary"] for r in rows)
        return self._boundaries_cache

    def _ensure_boundaries(self, cells: DataFrame) -> None:
        if os.path.isdir(self._boundaries_path):
            return
        n = (1 << self._bits) - 1
        qs = [(i + 1) / (1 << self._bits) for i in range(n)]
        img = _key_image_col(F.col("row_key"))
        bounds = (
            cells.select(img.alias("img"))
            .agg(F.percentile_approx("img", qs, 10_000).alias("bs"))
            .collect()[0]["bs"]
        )
        self.spark.createDataFrame(
            [(int(b),) for b in (bounds or [])], "boundary long"
        ).coalesce(1).write.mode("overwrite").parquet(self._boundaries_path)
        self._boundaries_cache = None

    def _key_bucket(self):
        bounds = self._load_boundaries()
        img = _key_image_col(F.col("row_key"))
        bucket = F.lit(0)
        for b in bounds:
            bucket = bucket + (img >= F.lit(b)).cast("int")
        return bucket

    def write(self, cells: DataFrame, num_range_partitions=None,
              seq_col=None) -> int:
        self._ensure_boundaries(cells)
        return super().write(cells, num_range_partitions, seq_col)

    def append(self, cells: DataFrame, seq_col=None) -> int:
        self._ensure_boundaries(cells)
        return super().append(cells, seq_col)

    # -- range reads ---------------------------------------------------------

    def _bucket_of(self, key: str) -> int:
        img = _key_image_py(key)
        return sum(1 for b in self._load_boundaries() if img >= b)

    def key_range_scan(
        self, lo: str, hi: str, b_values: list[int]
    ) -> DataFrame:
        """Cells with ``lo <= row_key < hi`` whose time bucket is in
        ``b_values``, reading only the zb partitions the range can touch:
        key buckets [bucket(lo) .. bucket(hi)] × b_values (closed-form,
        driver-side, metadata pruning) — then the exact residual range
        predicate. The time-dimension residual stays the caller's job,
        symmetrical with box_scan."""
        lo_b, hi_b = self._bucket_of(lo), self._bucket_of(hi)
        a_values = list(range(lo_b, hi_b + 1))
        return self.box_scan(a_values, b_values).filter(
            (F.col("row_key") >= lo) & (F.col("row_key") < hi)
        )
