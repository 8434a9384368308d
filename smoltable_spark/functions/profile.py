"""Data-quality and distribution profiling.

Two operators a 100 TB ingest needs before any training run:

- :func:`column_profile` — per-column null rate / distinct count / extrema,
  the "is this table sane" report. One wide-to-long explode (generated
  column, narrow) followed by ONE hash aggregate keyed by column name —
  never a per-column pass over the data.
- :func:`key_distribution` — per-group key-skew diagnostics (how hot is
  the hottest key), the report that decides whether a downstream join
  needs salting (functions/skew.py). Two map-side-combining aggregates;
  the second input is one row per distinct key, already small.

Everything is exact integer arithmetic → oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_null, n_distinct, min_val,
    max_val) with values compared as strings (portable across types).

    The wide table is melted with ``stack`` — a generated projection, no
    shuffle — so the single ``groupBy(column)`` aggregate is the only
    exchange regardless of how many columns are profiled.
    """
    if cols is None:
        cols = df.columns
    pairs: list = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    long = df.select(
        F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val")
    )
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).alias("n_null"),
        F.count_distinct(F.col("val")).alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def column_profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB rendering of :func:`column_profile` over ``table``."""
    branches = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM {table}"
        for c in cols
    )
    return f"""
    WITH long AS ({branches})
    SELECT col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
           min(val) AS min_val,
           max(val) AS max_val
    FROM long GROUP BY col_name
    """


def key_distribution(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group key-skew report: (group, n_events, n_keys, max_per_key,
    hot_key, skew_x100).

    ``skew_x100 = floor(100 * max_per_key * n_keys / n_events)`` — 100
    means perfectly uniform, N×100 means the hottest key is N× the mean;
    the decision number for salted-join routing. ``hot_key`` ties break
    to the smallest key (deterministic).
    """
    per_key = df.groupBy(group_col, key_col).agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.groupBy(group_col).agg(
        F.sum("cnt").alias("n_events"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_per_key"),
    )
    hot = (
        per_key.join(
            F.broadcast(stats.select(group_col, "max_per_key")), group_col
        )
        .filter(F.col("cnt") == F.col("max_per_key"))
        .groupBy(group_col)
        .agg(F.min(key_col).alias("hot_key"))
    )
    return (
        stats.join(hot, group_col)
        .withColumn(
            "skew_x100",
            F.floor(
                F.lit(100) * F.col("max_per_key") * F.col("n_keys") / F.col("n_events")
            ).cast("long"),
        )
    )


def key_distribution_sql(table: str, group_col: str, key_col: str) -> str:
    """DuckDB rendering of :func:`key_distribution`."""
    return f"""
    WITH per_key AS (
        SELECT {group_col}, {key_col}, CAST(count(*) AS BIGINT) AS cnt
        FROM {table} GROUP BY {group_col}, {key_col}
    ), stats AS (
        SELECT {group_col},
               CAST(sum(cnt) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(cnt) AS BIGINT) AS max_per_key
        FROM per_key GROUP BY {group_col}
    ), hot AS (
        SELECT p.{group_col}, min(p.{key_col}) AS hot_key
        FROM per_key p JOIN stats s
          ON p.{group_col} = s.{group_col} AND p.cnt = s.max_per_key
        GROUP BY p.{group_col}
    )
    SELECT s.{group_col}, s.n_events, s.n_keys, s.max_per_key, h.hot_key,
           CAST(floor(100 * s.max_per_key * s.n_keys / s.n_events) AS BIGINT)
               AS skew_x100
    FROM stats s JOIN hot h ON s.{group_col} = h.{group_col}
    """


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    permilles: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """EXACT per-group quantiles of an integer-valued column — e.g. the
    p50/p90/p99 document length per source that decides truncation and
    packing budgets.

    Scale shape: a sort-based exact quantile shuffles the corpus; an
    approx sketch (GK / t-digest) gives engine-specific answers that can
    never be oracle-pinned. This takes the third path for discrete
    values: ONE map-side-combining aggregate to a (group, value)
    histogram — rows bounded by |groups|·|distinct values|, not corpus
    size — then a cumulative window over that tiny table. The quantile
    definition is the inverse lower CDF on the 1e-3 grid, all-integer:
    ``q_p = min{{x : 1000·cum_count(x) ≥ p·n}}``.

    Returns (group, n, min/max value, one ``p{permille}`` column each).
    """
    from pyspark.sql import Window

    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    cum = hist.select(
        group_col,
        value_col,
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"),
    )
    aggs = [
        F.max("_n").cast("long").alias("n"),
        F.min(value_col).cast("long").alias("min_val"),
        F.max(value_col).cast("long").alias("max_val"),
    ] + [
        F.min(
            F.when(F.col("_cum") * 1000 >= F.lit(p) * F.col("_n"), F.col(value_col))
        )
        .cast("long")
        .alias(f"p{p}")
        for p in permilles
    ]
    return cum.groupBy(group_col).agg(*aggs)


def grouped_exact_quantiles_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    permilles: tuple[int, ...] = (500, 900, 990),
    group_alias: str = "g",
) -> str:
    """DuckDB rendering of :func:`grouped_exact_quantiles` (same grid)."""
    pcols = ", ".join(
        f"CAST(min(CASE WHEN cum * 1000 >= {p} * n THEN v END) AS BIGINT) AS p{p}"
        for p in permilles
    )
    return f"""
    WITH hist AS (SELECT {group_expr} AS g, {value_expr} AS v, count(*) AS c
                  FROM {table} GROUP BY 1, 2),
    cum AS (SELECT g, v,
                   sum(c) OVER (PARTITION BY g ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(c) OVER (PARTITION BY g) AS n
            FROM hist)
    SELECT g AS {group_alias}, CAST(max(n) AS BIGINT) AS n,
           CAST(min(v) AS BIGINT) AS min_val,
           CAST(max(v) AS BIGINT) AS max_val, {pcols}
    FROM cum GROUP BY g
    """
