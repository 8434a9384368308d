"""Bucketed co-located joins — the pre-shuffle layout for repeated big
joins (SURVEY §4: "repartition/bucketing for co-located joins").

``bucketBy`` hashes rows into a fixed bucket count at WRITE time; two
tables bucketed identically on the join key then join with ZERO shuffle
exchanges — the layout you give a fact table joined every day at 100 TB.
"""

import pytest
from pyspark.sql import functions as F

from smoltable_spark import plans


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # tables land in the session's default warehouse dir (spark-warehouse/,
    # gitignored) — warehouse.dir is a static conf, not settable per-test
    from smoltable_spark.sources.relational import load_table

    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        tbl = f"b_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bo, bl = bucketed_tables
    # disable auto-broadcast so the join strategy is the bucketed SMJ,
    # not a broadcast that would hide the shuffle question entirely
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(bl)
            .join(spark.table(bo), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # the JOIN itself must be shuffle-free (bucket-aligned scan on both
        # sides); the only exchange allowed is the final aggregation's
        assert plans.shuffle_count(joined) <= 1, plans.physical_plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join on plain parquet shuffles both sides."""
    from smoltable_spark.sources.relational import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert plans.shuffle_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_registry_bucketed_join_no_shuffle(spark, sf_dir):
    """The driver-visible rel_bucketed_join: MERGE-hinted join over the
    cached bucketed layout must keep the join exchange-free (only the
    final aggregation may shuffle)."""
    from smoltable_spark.queries_analytics import rel_bucketed_join

    df = rel_bucketed_join(spark, sf_dir)
    assert plans.shuffle_count(df) <= 1, plans.physical_plan(df)
    assert df.count() > 0
