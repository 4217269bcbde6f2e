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


def synthetic_real_media(spark: SparkSession, n: int = 40) -> DataFrame:
    """REAL media payloads the builtin codecs can decode: even ids are
    16-bit mono 8 kHz WAV files (1 kHz sine, amplitude 1000+i, exactly
    800*(i%10+1) frames -> 44-byte header + 2 bytes/frame), odd ids are
    binary PPM images (32x24, every channel = (i*7)%256). Every byte is
    produced by the actual file-format writers, so the decode step is a
    true parser round-trip, not a simulation."""
    import io
    import math
    import struct
    import wave as _wave

    rows = []
    for i in range(n):
        if i % 2 == 0:
            nf = 800 * ((i % 10) + 1)
            amp = 1000 + i
            frames = b"".join(
                struct.pack("<h", int(amp * math.sin(2 * math.pi * 1000 * k / 8000)))
                for k in range(nf)
            )
            buf = io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(frames)
            rows.append(
                (i, "audio", "audio/wav", None, None, nf * 1000 // 8000, buf.getvalue())
            )
        else:
            wd, ht = 32, 24
            val = (i * 7) % 256
            payload = b"P6\n32 24\n255\n" + bytes([val]) * (wd * ht * 3)
            rows.append((i, "image", "image/x-portable-pixmap", wd, ht, None, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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


# -- REAL builtin codecs (no external media libs needed) --------------------
# WAV rides on the stdlib `wave` module; PPM (P6) is a 3-line header +
# raw RGB, parsed with numpy. Compressed formats (JPEG/MP3/H.264) still
# need a real library — they keep the documented NotImplementedError
# swap point. This makes the decode step REAL end-to-end for the
# formats the container can express, not a simulation.

def _decode_wav(payload: bytes) -> dict:
    import io
    import wave as _wave

    import numpy as np

    with _wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        rate = w.getframerate()
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got width={width}")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    return {
        "pixels_or_samples": int(n_frames) * n_channels,
        "sample_rate": rate,
        "peak": float(np.max(np.abs(samples))) if len(samples) else 0.0,
        "mean_abs": float(np.mean(np.abs(samples))) if len(samples) else 0.0,
        "samples": samples,
    }


def _ppm_header_tokens(payload: bytes, n: int) -> tuple[list[bytes], int]:
    """Tokenize a PPM header per the Netpbm spec: tokens separated by
    ANY whitespace run, '#' comments run to end-of-line, and the pixel
    data starts after exactly ONE whitespace byte following the last
    header token. Returns (tokens, data_offset)."""
    toks: list[bytes] = []
    i, ln = 0, len(payload)
    while len(toks) < n and i < ln:
        c = payload[i : i + 1]
        if c in b" \t\r\n\x0b\x0c":
            i += 1
        elif c == b"#":
            while i < ln and payload[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < ln and payload[j : j + 1] not in b" \t\r\n\x0b\x0c#":
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < n:
        raise ValueError("truncated PPM header")
    return toks, i + 1  # one whitespace byte after maxval, then raster


def _decode_ppm(payload: bytes) -> dict:
    import numpy as np

    # P6 header per the spec: magic, width, height, maxval — separated
    # by any whitespace, '#' comments legal anywhere between tokens;
    # maxval > 255 switches to 2-byte big-endian samples
    toks, off = _ppm_header_tokens(payload, 4)
    if toks[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if not (0 < maxval < 65536):
        raise ValueError(f"PPM maxval out of range: {maxval}")
    dtype = np.uint8 if maxval < 256 else ">u2"
    pix = np.frombuffer(payload, dtype=dtype, count=w * h * 3, offset=off)
    arr = pix.reshape(h, w, 3).astype(np.float64)
    return {
        "pixels_or_samples": w * h,
        "width": w,
        "height": h,
        "maxval": maxval,
        "peak": float(arr.max()) if arr.size else 0.0,
        "mean_abs": float(arr.mean()) if arr.size else 0.0,
        "pixels": arr,
    }


def _builtin_decode(payload: bytes, mime: str) -> dict:
    if mime == "audio/wav":
        return _decode_wav(payload)
    if mime == "image/x-portable-pixmap":
        return _decode_ppm(payload)
    raise NotImplementedError(
        f"mime {mime!r} needs an external codec library; builtin codecs "
        "cover audio/wav and image/x-portable-pixmap"
    )


def decode_media(media: DataFrame, codec: str = "fake", batch_size: int = 64) -> DataFrame:
    """mapInPandas decode: Arrow-batched, bounded memory per worker.

    codec="fake"    -> deterministic stub (any payload);
    codec="builtin" -> REAL decode for WAV audio (stdlib wave + numpy
                       PCM) and binary PPM images (numpy) — unsupported
                       mimes raise NotImplementedError at executor time
                       naming the swap point for compressed formats.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec not in ("fake", "builtin"):
                raise NotImplementedError(
                    f"codec {codec!r}: install a media library and extend "
                    "emap_spark.multimodal.binary_ops._builtin_decode"
                )
            out = []
            for mid, kind, mime, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["mime"], pdf["payload"]
            ):
                raw = bytes(payload)
                if codec == "builtin":
                    d = _builtin_decode(raw, mime)
                    checksum = hashlib.md5(raw).hexdigest()
                else:
                    d = _fake_decode(raw, kind)
                    checksum = d["checksum"]
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(raw),
                        "checksum": checksum,
                        "pixels_or_samples": d["pixels_or_samples"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.select("media_id", "kind", "mime", "payload").mapInPandas(
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_bytes", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize (north-star multimodal op): decode the PPM
    raster (true parser, _decode_ppm), nearest-neighbor resample with
    numpy index grids, re-encode as PPM — all inside Arrow-batched
    mapInPandas, so each worker holds one batch of images, never the
    corpus. Compressed formats inherit _builtin_decode's documented
    NotImplementedError swap point. At 100 TB this is the thumbnail /
    model-input-normalization pass of a vision-data pipeline."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = _decode_ppm(bytes(payload))
                arr = d["pixels"]  # (h, w, 3) float64
                ys = np.arange(out_h) * d["height"] // out_h
                xs = np.arange(out_w) * d["width"] // out_w
                small = arr[np.ix_(ys, xs)]
                # 16-bit PPMs (maxval > 255) rescale to the 8-bit output
                # range — a bare uint8 cast would wrap values mod 256
                # (ADVICE r4)
                if d["maxval"] != 255:
                    small = np.round(small * (255.0 / d["maxval"]))
                small = small.astype(np.uint8)
                out = (
                    b"P6\n%d %d\n255\n" % (out_w, out_h) + small.tobytes()
                )
                rows.append(
                    {
                        "media_id": mid,
                        "src_w": d["width"],
                        "src_h": d["height"],
                        "out_w": out_w,
                        "out_h": out_h,
                        "out_bytes": len(out),
                        "mean_value": float(small.mean()),
                        "payload": out,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, RESIZED_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def audio_features(media: DataFrame, frame_len: int = 160) -> DataFrame:
    """REAL audio feature extraction over decoded PCM: frame the signal
    into `frame_len`-sample windows (160 = 20 ms at 8 kHz, the standard
    speech hop) and report per-file n_samples / whole frames / peak
    amplitude / zero-crossing count / duration.

    The DSP runs on the true int16 PCM (stdlib wave parse + numpy; same
    builtin-codec path as decode_media) inside Arrow-batched mapInPandas
    — bounded memory, corpus-linear, no shuffle. All reported features
    are integer-exact, so the oracle has a closed form from the fixture
    generator (q124). Non-audio rows are filtered BEFORE the UDF so the
    scan prunes the image payload bytes.

    Error contract: a CORRUPT payload (truncated/non-RIFF — wave raises
    wave.Error or EOFError) is isolated to its own row, emitted with
    null features so one bad file can't fail a 100-TB job; callers count
    `n_samples IS NULL` for a corruption rate. A DECODABLE file in an
    unsupported layout (non-16-bit / non-mono) still fails fast — that
    is the documented swap point for wider codec support, a systematic
    capability gap rather than a bad row."""
    import io
    import wave as _wave

    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nulls = dict.fromkeys(
            [f.name for f in AUDIO_FEATURES_SCHEMA.fields if f.name != "media_id"]
        )
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with _wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        if w.getsampwidth() != 2 or w.getnchannels() != 1:
                            raise NotImplementedError(
                                "only 16-bit mono PCM; extend audio_features "
                                "for other widths/channel layouts"
                            )
                        rate = w.getframerate()
                        pcm = np.frombuffer(
                            w.readframes(w.getnframes()), dtype="<i2"
                        ).astype(np.int64)
                except (_wave.Error, EOFError, ValueError):
                    # ValueError: a data chunk truncated to an odd byte
                    # count parses through wave but breaks
                    # np.frombuffer(dtype='<i2') — same per-row
                    # corruption class as a wave.Error.
                    out.append({"media_id": mid, **nulls})
                    continue
                n = len(pcm)
                nonneg = pcm >= 0
                out.append(
                    {
                        "media_id": mid,
                        "n_samples": n,
                        "n_frames": n // frame_len,
                        "peak_abs": int(np.abs(pcm).max()) if n else 0,
                        "zero_crossings": int(
                            (nonneg[1:] != nonneg[:-1]).sum()
                        ),
                        "duration_ms": n * 1000 // rate,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, AUDIO_FEATURES_SCHEMA)
    )
