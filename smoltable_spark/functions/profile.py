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
