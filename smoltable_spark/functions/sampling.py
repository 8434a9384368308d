"""Deterministic sampling for training-data pipelines.

Stratified sampling is the workhorse of corpus mixing: "keep 10% of English,
100% of the low-resource languages". At 100 TB it must be

- a *narrow* operation (a filter, never a shuffle or a sort),
- deterministic and seed-stable (re-running the pipeline on the same
  corpus picks the same rows — required for reproducible training sets),
- and independent of partitioning / row order (unlike ``df.sample``,
  whose result depends on how rows land in partitions).

Both properties come from hashing the row's identity rather than rolling
RNG state: keep row iff ``md5(seed|stratum|id) mod M < rate*M``. The hash
is the portable md5-derived one (functions/hashing.py) so every sample is
oracle-checkable in DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from smoltable_spark.functions.hashing import md5_long, md5_long_sql

#: modulus for rate quantization — rates are exact multiples of 1e-6
RATE_MOD = 1_000_000


def keep_fraction(seed: str, ident: Column, rate: float) -> Column:
    """Boolean column: deterministically keep ~``rate`` of rows by identity
    hash. ``ident`` must uniquely identify the row (e.g. its doc_id)."""
    bucket = md5_long(F.concat(F.lit(seed + "|"), ident)) % RATE_MOD
    return bucket < int(round(rate * RATE_MOD))


def keep_fraction_sql(seed: str, ident_expr: str, rate: float) -> str:
    """DuckDB rendering of :func:`keep_fraction` (same bits)."""
    h = md5_long_sql(f"concat('{seed}|', {ident_expr})")
    return f"({h} % {RATE_MOD}) < {int(round(rate * RATE_MOD))}"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    seed: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rate sampling.

    A single narrow ``filter`` over the corpus — the per-stratum rate is a
    CASE expression, the keep decision a hash compare; no shuffle, no
    driver collect, trivially parallel at any scale. Strata absent from
    ``rates`` fall back to ``default_rate`` (0 = drop).
    """
    ident = F.concat(F.col(strata_col), F.lit("|"), F.col(id_col).cast("string"))
    bucket = md5_long(F.concat(F.lit(seed + "|"), ident)) % RATE_MOD
    cut = F.lit(int(round(default_rate * RATE_MOD)))
    for stratum, rate in sorted(rates.items()):
        cut = F.when(
            F.col(strata_col) == stratum, int(round(rate * RATE_MOD))
        ).otherwise(cut)
    return df.filter(bucket < cut)


def stratified_sample_sql(
    strata_expr: str,
    id_expr: str,
    rates: dict[str, float],
    seed: str = "strat",
    default_rate: float = 0.0,
) -> str:
    """DuckDB WHERE-clause rendering of :func:`stratified_sample`."""
    ident = f"concat({strata_expr}, '|', CAST({id_expr} AS VARCHAR))"
    h = md5_long_sql(f"concat('{seed}|', {ident})")
    cases = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {int(round(r * RATE_MOD))}"
        for s, r in sorted(rates.items())
    )
    cut = f"CASE {cases} ELSE {int(round(default_rate * RATE_MOD))} END"
    return f"({h} % {RATE_MOD}) < ({cut})"


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the top-``k`` rows per group under a deterministic total order
    (``order_cols`` must break all ties) — the per-source document cap of
    a crawl-balancing pipeline.

    Scale path: a naive ``Window.partitionBy(group)`` gives every group
    ONE task — a hot source (half the corpus behind one domain) becomes
    one straggler. Because the global top-k of a group is contained in
    the union of its per-partition top-k's, stage 1 ranks within
    (group, input-partition) — windows keyed by the partition id never
    skew — and keeps ≤ k rows each; stage 2 re-ranks only the survivors
    (≤ k × n_partitions rows per group). The group-keyed shuffle
    therefore carries survivors, not the corpus.
    """
    order = [c.asc() if hasattr(c, "asc") else F.col(c).asc() for c in order_cols]
    local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(*order)
    survivors = (
        df.withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= k)
        .drop("_lrk")
    )
    final = Window.partitionBy(group_col).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(final))
        .filter(F.col(rank_col) <= k)
    )
