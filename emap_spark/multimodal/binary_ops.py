"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata (BASELINE.json north_star). The reference's analogue is
LabResult.valueAsBytes (PDF reports, labs/LabResult.java:97).

The Spark-side plumbing — schema, partition-friendly layout, Arrow batch
shape, mapInPandas signatures — is real and tested. The codec step
itself is STUBBED: the container has no image/audio libraries, so
decode_media ships a deterministic fake decoder behind `codec="fake"`
and raises NotImplementedError for real codecs. Swapping in
PIL/torchaudio means replacing ONE function body; every interface
stays identical.

Scale notes: media bytes ride the same parquet row-groups as scalars;
mapInPandas streams Arrow batches so a 100 MB video row never
materializes more than batch_size rows per worker. Feature extraction
outputs (embeddings, stats) are plain array<float> columns that feed
the similarity operators (emap_spark.plans.similarity).
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

try:  # self-contained closures for external drivers (see collation.py)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("pixels_or_samples", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media: payload = repeatable bytes from the id."""
    base = spark.range(n)
    kind = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.sha2(F.col("id").cast("string").cast("binary"), 256).cast("binary")
    return base.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
        F.when(kind == "image", F.lit(64)).cast("int").alias("width"),
        F.when(kind == "image", F.lit(48)).cast("int").alias("height"),
        F.when(kind != "image", (F.col("id") % 60 + 1) * 1000).cast("int").alias("duration_ms"),
        payload.alias("payload"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed-metadata rollup — pure column ops, no decode needed."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("duration_ms").alias("max_duration_ms"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real codec: stable checksum + a fake
    pixel/sample count derived from the bytes."""
    digest = hashlib.md5(payload).hexdigest()
    n = int(digest[:8], 16) % 100_000
    return {"checksum": digest, "pixels_or_samples": n}


def decode_media(media: DataFrame, codec: str = "fake", batch_size: int = 64) -> DataFrame:
    """mapInPandas decode: Arrow-batched, bounded memory per worker.

    codec="fake" -> deterministic stub (container has no media libs);
    any other codec raises NotImplementedError AT EXECUTOR TIME with a
    clear message naming the swap point.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec != "fake":
                raise NotImplementedError(
                    f"codec {codec!r}: install a media library and replace "
                    "emap_spark.multimodal.binary_ops._fake_decode"
                )
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                d = _fake_decode(bytes(payload), kind)
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "checksum": d["checksum"],
                        "pixels_or_samples": d["pixels_or_samples"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, DECODED_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction to array<float> (feeds the ANN operators).
    Fake featurizer: bytes -> deterministic pseudo-embedding."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.sha256(bytes(payload)).digest()
                vec = [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]
                rows.append({"media_id": mid, "feature": vec})
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp.
    The frame DECODE is the stubbed step; the explode/plumbing is real."""
    frames = F.sequence(
        F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )
