"""HL7 text parsing golden tests (§5.1 style) + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from emap_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    frame_sample,
    synthetic_media,
)
from emap_spark.sources.hl7_text import adt_from_hl7, field, hl7_ts, synthetic_hl7_messages


def test_hl7_field_extraction(spark):
    raw = "MSH|^~\\&|EPIC|UCLH|x|x|20130101073000||ADT^A01|MSG1|P|2.4\rPID|1||40180000^^^MRN\rPV1|1|I|T42E^T42E BY02^BY02-17"
    df = spark.createDataFrame([(raw,)], "hl7 string")
    r = df.select(
        field(F.col("hl7"), "MSH", 9, 2).alias("trigger"),
        field(F.col("hl7"), "PID", 3, 1).alias("mrn"),
        field(F.col("hl7"), "PV1", 3, 1).alias("loc"),
        hl7_ts(field(F.col("hl7"), "MSH", 7)).alias("ts"),
    ).collect()[0]
    assert r.trigger == "A01"
    assert r.mrn == "40180000"
    assert r.loc == "T42E"
    assert str(r.ts) == "2013-01-01 07:30:00"


def test_adt_from_hl7_routing(spark):
    out = adt_from_hl7(synthetic_hl7_messages(spark, n=8)).collect()
    by_id = {r.source_message_id: r for r in out}
    assert by_id["MSG00000000"].message_type == "ADMIT"
    assert by_id["MSG00000001"].message_type == "TRANSFER"
    assert by_id["MSG00000002"].message_type == "DISCHARGE"
    assert by_id["MSG00000003"].message_type == "UPDATE_PATIENT_INFO"
    r = by_id["MSG00000000"]
    assert r.mrn == "40180000"
    assert r.location.value.startswith("T42E")
    assert r.name_family.value == "Family0" and r.name_given.value == "Given0"


def test_media_decode_deterministic(spark):
    media = synthetic_media(spark, n=12)
    a = sorted((r.media_id, r.checksum) for r in decode_media(media).collect())
    b = sorted((r.media_id, r.checksum) for r in decode_media(media).collect())
    assert a == b and len(a) == 12


def test_media_unsupported_codec_raises(spark):
    import pytest

    media = synthetic_media(spark, n=2)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(media, codec="jpeg").collect()


def test_media_features_feed_similarity(spark):
    feats = extract_features(synthetic_media(spark, n=10), dim=8).collect()
    assert all(len(r.feature) == 8 for r in feats)
    assert all(-1.0 <= v <= 1.0 for r in feats for v in r.feature)


def test_frame_sampling_plan(spark):
    media = synthetic_media(spark, n=9)
    frames = frame_sample(media, every_ms=10_000).collect()
    vids = media.filter(F.col("kind") == "video").count()
    assert len({r.media_id for r in frames}) == vids


def test_oru_vendor_routing_and_calibration_quirk(spark):
    from emap_spark.sources.hl7_text import observations_from_oru, synthetic_oru_messages

    out = observations_from_oru(synthetic_oru_messages(spark, n=8)).collect()
    vendors = {r.vendor for r in out}
    assert vendors == {"EPIC_FLOWSHEET", "WINPATH", "ABL90_FLEX"}  # unknown dropped
    # ABL90 calibration OBX rows are filtered
    abl = [r for r in out if r.vendor == "ABL90_FLEX"]
    assert abl and all(not r.observation_id.lower().startswith("cal") for r in abl)
    hr = [r for r in out if r.observation_id == "HR"][0]
    assert hr.value_type == "NUMERIC" and hr.value_as_real >= 60.0 and hr.unit == "bpm"
    note = [r for r in out if r.observation_id == "NOTE"][0]
    assert note.value_type == "TEXT" and note.value_as_text.startswith("stable")


def test_identifier_changes_and_move_visit(spark):
    from emap_spark.operators.identity import apply_identifier_changes, move_visit
    from pyspark.sql import functions as F

    mrns = spark.createDataFrame([("a",), ("b",), ("c",)], "mrn string")
    changes = spark.createDataFrame(
        [("a", "a2"), ("c", "b")], "old_mrn string, new_mrn string"
    )  # c->b collides with existing b: must NOT apply
    out = sorted(r.mrn for r in apply_identifier_changes(mrns, changes).collect())
    assert out == ["a2", "b", "c"]

    visits = spark.createDataFrame(
        [("E1", "a"), ("E2", "b")], "encounter string, mrn string"
    )
    moves = spark.createDataFrame([("E1", "b")], "encounter string, to_mrn string")
    moved = {r.encounter: r.mrn for r in move_visit(visits, moves).collect()}
    assert moved == {"E1": "b", "E2": "b"}


def test_death_info_consistency(spark):
    from emap_spark.functions.hl7 import death_info_consistent
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Y", "2024-01-01 10:00:00"), ("N", "2024-01-01 10:00:00"), ("N", None), ("Y", None)],
        "ind string, dt string",
    ).select(
        death_info_consistent(
            F.col("ind"), F.col("dt").cast("timestamp_ntz")
        ).alias("ok")
    )
    assert [r.ok for r in df.collect()] == [True, False, True, True]


def test_audio_features_real_dsp_and_width_guard(spark):
    """audio_features computes framing/peak/zero-crossings on the TRUE
    decoded PCM (not metadata): a hand-built two-tone WAV with a known
    sign pattern checks the DSP; a stereo payload hits the documented
    NotImplementedError swap point."""
    import io
    import struct
    import wave as _wave

    import pytest as _pytest

    from emap_spark.multimodal.binary_ops import MEDIA_SCHEMA, audio_features

    # 400 samples alternating [+5, +5, -5, -5]: sign flips every 2
    # samples -> 199 transitions over 399 pairs; peak 5; 2 full frames
    pcm = b"".join(
        struct.pack("<h", 5 if (k // 2) % 2 == 0 else -5) for k in range(400)
    )
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm)
    stereo = io.BytesIO()
    with _wave.open(stereo, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm)
    rows = [
        (1, "audio", "audio/wav", None, None, 50, buf.getvalue()),
        (2, "image", "image/x-portable-pixmap", 1, 1, None, b"P6\n1 1\n255\nabc"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = audio_features(media, frame_len=160).collect()
    assert len(got) == 1  # image rows filtered before the UDF
    r = got[0]
    assert (r.n_samples, r.n_frames, r.peak_abs) == (400, 2, 5)
    assert r.zero_crossings == 199 and r.duration_ms == 50

    bad = spark.createDataFrame(
        [(3, "audio", "audio/wav", None, None, 50, stereo.getvalue())],
        MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception, match="16-bit mono"):
        audio_features(bad).collect()

    # corrupt payloads are isolated per row (null features), they do
    # not fail the batch — the good row in the same batch still decodes
    corrupt = spark.createDataFrame(
        [
            (4, "audio", "audio/wav", None, None, 50, b"not RIFF at all"),
            (5, "audio", "audio/wav", None, None, 50, buf.getvalue()[:20]),
            (6, "audio", "audio/wav", None, None, 50, buf.getvalue()),
        ],
        MEDIA_SCHEMA,
    ).coalesce(1)
    by_id = {r.media_id: r for r in audio_features(corrupt, frame_len=160).collect()}
    assert len(by_id) == 3
    assert by_id[4].n_samples is None and by_id[4].peak_abs is None
    assert by_id[5].n_samples is None
    assert (by_id[6].n_samples, by_id[6].zero_crossings) == (400, 199)

    # a data chunk truncated to an ODD byte count parses through wave
    # but breaks np.frombuffer(dtype='<i2') with ValueError — it must
    # take the same per-row null-feature path, not fail the batch
    odd = spark.createDataFrame(
        [
            (7, "audio", "audio/wav", None, None, 50, buf.getvalue()[:-1]),
            (8, "audio", "audio/wav", None, None, 50, buf.getvalue()),
        ],
        MEDIA_SCHEMA,
    ).coalesce(1)
    by_id = {r.media_id: r for r in audio_features(odd, frame_len=160).collect()}
    assert by_id[7].n_samples is None
    assert (by_id[8].n_samples, by_id[8].peak_abs) == (400, 5)
