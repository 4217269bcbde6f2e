"""SparkSession factory.

Local mode is a single JVM (driver-only); on a real cluster the same
configuration applies, with shuffle partitions scaled to cores × 2-3.
AQE is on so runtime re-planning (partition coalescing, skew-join
splitting, broadcast demotion/promotion) handles the 100 TB case where
static planning guesses wrong.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "emap_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = int(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # the merge fold generates ~140 distinct codegen classes per
        # micro-batch across concurrent table merges; the default
        # 100-entry codegen cache thrashes (measured: 143 Janino
        # recompiles per REPEATED 20k batch -> 12 with a sized cache).
        # ~30 KB bytecode per class puts 2000 entries around 60 MB.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("EMAP_CODEGEN_CACHE", "2000"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
