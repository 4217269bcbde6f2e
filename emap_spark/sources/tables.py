"""Parquet table loaders for the driver-generated test tables.

At 100 TB these reads hit a partitioned lakehouse layout; locally they are
single parquet files. Catalyst pushes filters/column pruning into the scan
either way — callers should select/filter on the returned DataFrame and
let pushdown do its job, not pre-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
        # raw long. Truncate ns -> us (exactly what DuckDB does on read) and
        # restore a NTZ timestamp so downstream code sees one timestamp type.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # Branch on the schema actually read, not on the conf having taken
        # effect: a concurrently-analyzed plan (e.g. an Observation listener)
        # can see the file as TIMESTAMP before the conf applies.
        if isinstance(df.schema["ts"].dataType, LongType):
            ts = F.timestamp_micros(F.expr("ts div 1000"))
        else:
            ts = F.col("ts")
        return df.withColumn("ts", ts.cast("timestamp_ntz"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can address them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
