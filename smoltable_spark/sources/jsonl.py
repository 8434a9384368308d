"""Bulk JSONL ingest — the reference's write payload, distributed.

The reference's only ingest surface is JSON row-write items over REST
(``server/src/api/write.rs:23-132``; shape
``{row_key, cells: [{column_key, timestamp?, value: {<type>: v}}]}``
with a 10 MiB request cap, main.rs:124-126). A migrating user's natural
bulk format is therefore JSONL of exactly these items; this reader turns
an arbitrarily large directory of them into canonical cells with zero
driver-side work: schema-d JSON scan → explode → JVM-side string split +
type dispatch. Contrast ``writer.rows_to_cells``, which is the small
driver-side API path for interactive writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from smoltable_spark.schema import VTYPE_COLUMNS

#: JSON value variant → (vtype tag, Spark type) — mirrors schema.py §1.3
_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("string", T.StringType()),
        T.StructField("boolean", T.BooleanType()),
        T.StructField("byte", T.ShortType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("i64", T.LongType()),
        T.StructField("f32", T.FloatType()),
        T.StructField("f64", T.DoubleType()),
    ]
)

WRITE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("row_key", T.StringType()),
        T.StructField(
            "cells",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("column_key", T.StringType()),
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("value", _VALUE_SCHEMA),
                    ]
                )
            ),
        ),
    ]
)


def ingest_jsonl(spark: SparkSession, path: str, default_ts: int = 0) -> DataFrame:
    """Read reference-shaped JSONL write items into canonical cells.

    Entirely JVM-side: one JSON scan (schema'd — no sampling pass), one
    explode, narrow projections. Missing timestamps take ``default_ts``
    (the API path defaults to now-nanos; bulk loads want an explicit,
    reproducible default). Unlike the interactive path
    (``writer.rows_to_cells``), identifiers are NOT charset-validated here
    — a bulk load trusts its dump; the split is lenient (first ':' wins)
    for out-of-spec keys rather than failing the whole job.
    """
    items = spark.read.schema(WRITE_ITEM_SCHEMA).json(path)
    c = items.select("row_key", F.explode("cells").alias("c"))
    ck = F.col("c.column_key")
    has_colon = F.instr(ck, ":") > 0
    family = F.when(has_colon, F.substring_index(ck, ":", 1)).otherwise(ck)
    qualifier = F.when(
        has_colon, F.expr("substring(c.column_key, instr(c.column_key, ':') + 1)")
    ).otherwise(F.lit(""))

    vtype = F.lit(None).cast("string")
    for tag in VTYPE_COLUMNS:  # first non-null variant wins (exactly one is set)
        vtype = F.coalesce(vtype, F.when(F.col(f"c.value.{tag}").isNotNull(), F.lit(tag)))

    cols = [
        F.col("row_key"),
        family.alias("family"),
        qualifier.alias("qualifier"),
        F.coalesce(F.col("c.timestamp"), F.lit(default_ts)).cast("long").alias("ts"),
        vtype.alias("vtype"),
    ]
    for tag, vcol in VTYPE_COLUMNS.items():
        cols.append(F.col(f"c.value.{tag}").alias(vcol))
    return c.select(*cols)
