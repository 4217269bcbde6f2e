"""Bus/queue source wiring for the interchange stream (SURVEY §2.1; the
reference ingests via RabbitMQ — emap-interchange/.../messaging/
Publisher.java:32-90 publishes typed messages onto named queues, core
consumes them in priority order, App.java:68-75).

Spark shape: Structured Streaming's Kafka source is the bus. The
transport layer is isolated from the parse layer:

  * kafka_stream(...)            — readStream.format("kafka"); requires
    the spark-sql-kafka connector on the classpath (gated with a clear
    error when absent — this container ships without it).
  * decode_interchange(df, fn)   — Kafka-record-schema frame -> parsed
    interchange rows. Everything downstream (collation, merge pipeline)
    is transport-agnostic: any frame with the Kafka record schema works,
    which is exactly how the integration test drives the full pipeline
    from a Kafka-shaped file stream without a broker.

Partitioning note for 100 TB: one Kafka partition per (queue, priority)
maps to the reference's queue layout; the merge pipeline's dedupe on
source_message_id (W4) absorbs Kafka's at-least-once redelivery, and
offsets ride in Spark's checkpoint (K1 ack bookkeeping analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# The exact record schema Spark's Kafka source produces — stand-ins used
# in tests must match it so decode_interchange is provably
# transport-agnostic.
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """readStream over Kafka topics (live path). Raises with a clear
    message when the connector jar is absent."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - connector not in container
        raise RuntimeError(
            "Kafka connector unavailable (add spark-sql-kafka-0-10 to the "
            "classpath); for broker-less runs feed decode_interchange any "
            "stream with KAFKA_RECORD_SCHEMA"
        ) from e


def kafka_batch(
    spark: SparkSession, bootstrap_servers: str, topics: str
) -> DataFrame:
    """Bounded read of the same topics (backfill / validation replay)."""
    try:
        return (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .load()
        )
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "Kafka connector unavailable (add spark-sql-kafka-0-10 to the "
            "classpath)"
        ) from e


def decode_interchange(records: DataFrame, parse_fn, text_col: str = "hl7") -> DataFrame:
    """Kafka records -> parsed interchange rows.

    parse_fn: a batch parse function over a frame with a text column
    (e.g. adt_from_hl7, waveform_from_hl7 partial, consults_from_hl7) —
    the SAME functions the file/socket paths use; the bus contributes
    only bytes + offsets. The record timestamp rides along as
    kafka_timestamp for latency accounting."""
    decoded = records.select(
        F.col("value").cast("string").alias(text_col),
        F.col("topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_timestamp"),
    )
    return parse_fn(decoded)


def priority_topic_union(live: DataFrame, backfill: DataFrame) -> DataFrame:
    """W5 live-over-backfill as topic layout: tag records with their
    queue priority (the reference consumes queue names in priority
    order); process_prioritized drains the live tag first."""
    return live.withColumn("__priority", F.lit(0)).unionByName(
        backfill.withColumn("__priority", F.lit(1))
    )
