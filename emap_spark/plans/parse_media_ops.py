"""Rows-only driver entries: HL7 text parsing (S3-S5) and multimodal
binary-column operators. Deterministic generated input; not
SQL-expressible over the driver's parquet views."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    frame_sample,
    media_metadata,
    synthetic_media,
)
from emap_spark.registry import register
from emap_spark.sources.hl7_text import adt_from_hl7, synthetic_hl7_messages


@register(
    "q75_hl7_parse_route",
    doc=(
        "S3-S5: raw pipe-delimited HL7 -> typed ADT interchange rows, all "
        "JVM-side (split/transform/filter column expressions, no UDF)."
    ),
)
def q75_hl7_parse_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = synthetic_hl7_messages(spark, n=40)
    return adt_from_hl7(raw).select(
        "source_message_id",
        "message_type",
        "mrn",
        "visit_number",
        F.col("patient_class")["value"].alias("patient_class"),
        F.col("location")["value"].alias("location"),
        "valid_from",
    )


@register(
    "q76_media_metadata",
    doc="Multimodal: typed-metadata rollup over binary media columns.",
)
def q76_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(synthetic_media(spark, n=120))


@register(
    "q77_media_decode_features",
    doc=(
        "Multimodal: mapInPandas decode (stubbed codec, real Arrow "
        "plumbing) + feature extraction into array<float> for ANN."
    ),
)
def q77_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=60)
    decoded = decode_media(media)
    feats = extract_features(media, dim=8)
    return (
        decoded.join(feats, "media_id")
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "checksum",
            F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + F.abs(x)), 4).alias(
                "feature_l1"
            ),
        )
    )


@register(
    "q78_video_frame_plan",
    doc="Multimodal: frame-sampling plan (explode) for video rows.",
)
def q78_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=30)
    return frame_sample(media, every_ms=5000).groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"), F.max("frame_ms").alias("last_frame_ms")
    )
