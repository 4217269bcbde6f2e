"""Bus-source wiring (SURVEY §2.1; reference bus = RabbitMQ,
emap-interchange/.../messaging/Publisher.java:32-90): the transport
layer is the Kafka record schema; decode_interchange + the existing
parse fns do the rest. No broker ships in this container, so the
integration test drives run_stream from a stream with EXACTLY the Kafka
record schema (KAFKA_RECORD_SCHEMA) — proving the full pipeline is
transport-agnostic: swap in readStream.format("kafka") and nothing
downstream changes."""

from __future__ import annotations

import datetime
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from emap_spark.app import EmapEngine
from emap_spark.sources.hl7_text import adt_from_hl7, synthetic_hl7_adt_full
from emap_spark.sources.kafka import KAFKA_RECORD_SCHEMA, decode_interchange


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kafka_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _kafka_records(spark, hl7_df):
    """HL7 fixtures -> frames with the exact Kafka record schema."""
    rows = [
        (
            None,
            r.hl7.encode(),
            "interchange.adt",
            int(r.id) % 4,
            int(r.id),
            datetime.datetime(2024, 3, 1, 12, 0, 0),
            0,
        )
        for r in hl7_df.collect()
    ]
    return spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)


def test_kafka_shaped_stream_matches_batch_path(spark, tmpdir):
    fixture = synthetic_hl7_adt_full(spark, n=20)
    records = _kafka_records(spark, fixture)
    assert records.schema == KAFKA_RECORD_SCHEMA

    # decode layer alone: identical parse to the direct batch path
    decoded = decode_interchange(records, adt_from_hl7)
    direct = adt_from_hl7(fixture)
    key = lambda r: r["source_message_id"]  # noqa: E731
    assert sorted(
        (r.source_message_id, r.message_type, r.mrn, r.visit_number)
        for r in decoded.collect()
    ) == sorted(
        (r.source_message_id, r.message_type, r.mrn, r.visit_number)
        for r in direct.collect()
    )

    # full integration: run_stream over the Kafka-shaped stream -> merge
    # pipeline; final tables equal the batch-path engine's
    src = f"{tmpdir}/records"
    records.write.parquet(src)
    stream = spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(src)
    eng_stream = EmapEngine(storage_root=f"{tmpdir}/state")
    q = eng_stream.run_stream(
        decode_interchange(stream, adt_from_hl7), f"{tmpdir}/ckpt"
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if eng_stream.pipeline.metrics:
                break
            if q.exception():
                raise AssertionError(q.exception())
            time.sleep(1)
        q.processAllAvailable()
    finally:
        q.stop()

    eng_batch = EmapEngine()
    eng_batch.process_batch(direct, 0)

    def snap(eng):
        return sorted(
            (r.encounter, r.mrn, str(r.admission_datetime), str(r.discharge_datetime))
            for r in eng.table("hospital_visit").collect()
        )

    assert snap(eng_stream) == snap(eng_batch)
    assert snap(eng_stream)  # non-empty
