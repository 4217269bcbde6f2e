"""Rows-only driver entries for the streaming/waveform/location operators
(SURVEY §2.1 S12, §2.4 D6/D19, §2.5 W1/W7, §2.6 Q6/Q7). These run the
real operators on deterministic generated input — they are not
SQL-expressible over the parquet tables (stateful collation, interval
reconstruction), so the driver records the weaker rows-only check
(contract documented in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.operators.locations import infer_location_visits
from emap_spark.registry import register
from emap_spark.sources.generators import adt_messages, waveform_stream
from emap_spark.streaming.collation import collate_batch, gap_report
from emap_spark.streaming.pipeline import retention_sweep


@register(
    "q70_waveform_collation",
    doc=(
        "W1 collation over the S12 sine generator: 4 patients x 300 Hz x "
        "60 s in 5-sample HL7-sized messages -> 3000-sample array rows "
        "(the reference's 10 s @300 Hz row target)."
    ),
)
def q70_waveform_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=4, sampling_rate=300, seconds=60)
    collated = collate_batch(
        msgs.withColumnRenamed("observation_time", "observation_time"), target_samples=3000
    )
    return collated.select(
        "source_location",
        "source_stream_id",
        "observation_datetime",
        "n_samples",
        "is_final_partial",
        F.round(F.aggregate("values_array", F.lit(0.0), lambda a, x: a + F.abs(x)), 3).alias(
            "abs_sum"
        ),
    )


@register(
    "q71_waveform_gap_report",
    doc="Q6 gap detection on a stream with a dropped message window.",
)
def q71_waveform_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=2, sampling_rate=300, seconds=30)
    # drop 2 s of data from one stream -> a gap the collator must not bridge
    gap_lo = F.lit("2024-01-01 00:00:10").cast("timestamp_ntz")
    gap_hi = F.lit("2024-01-01 00:00:12").cast("timestamp_ntz")
    gappy = msgs.filter(
        ~(
            (F.col("source_location").startswith("T00"))
            & F.col("observation_time").between(gap_lo, gap_hi)
        )
    )
    return gap_report(collate_batch(gappy, target_samples=3000))


@register(
    "q72_location_visit_inference",
    doc="D6 recompute: admit/transfer/discharge history -> interval rows.",
)
def q72_location_visit_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    return infer_location_visits(adt_messages(spark, n_patients=25))


@register(
    "q73_waveform_visit_attach",
    doc=(
        "D19 point-in-time attach: collated waveform rows interval-join to "
        "the LocationVisit covering (location, observation_time); unmatched "
        "rows stay orphans with null encounter (WaveformController.java:60-66)."
    ),
)
def q73_waveform_visit_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    lv = infer_location_visits(adt_messages(spark, n_patients=10))
    msgs = waveform_stream(
        spark, n_patients=10, sampling_rate=300, seconds=30, start="2024-01-01 12:30:00"
    ).withColumn(
        "source_location",
        F.format_string(
            "T%dE^BY02^BED-2",
            F.substring(F.col("source_location"), 2, 2).cast("int") % 5,
        ),
    )
    collated = collate_batch(msgs, target_samples=3000)
    attached = collated.join(
        lv,
        (F.col("source_location") == F.col("location_string"))
        & (F.col("observation_datetime") >= F.col("admission_datetime"))
        & (
            F.col("discharge_datetime").isNull()
            | (F.col("observation_datetime") < F.col("discharge_datetime"))
        ),
        "left",
    )
    return attached.groupBy("source_location").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("visit_number")).alias("n_attached"),
        F.sum(F.when(F.col("visit_number").isNull(), 1).otherwise(0)).alias("n_orphans"),
    )


@register(
    "q74_waveform_retention",
    doc="K4/W7 retention sweep baselined on max(observation_datetime).",
)
def q74_waveform_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=2, sampling_rate=50, seconds=120)
    kept = retention_sweep(msgs, ts_col="observation_time", retention_hours=0)
    # retention_hours=0 keeps only rows at the max timestamp boundary
    all_n = msgs.groupBy("source_location").agg(F.count(F.lit(1)).alias("n_before"))
    kept_n = kept.groupBy("source_location").agg(F.count(F.lit(1)).alias("n_after"))
    return all_n.join(kept_n, "source_location", "left").select(
        "source_location", "n_before", F.coalesce("n_after", F.lit(0)).alias("n_after")
    )
