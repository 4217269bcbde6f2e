"""True Structured Streaming test for collate_stream: file source ->
applyInPandasWithState -> memory sink, mirroring the reference's live
waveform path (§3.2)."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import Row

from emap_spark.streaming.collation import _retain_unemitted, collate_stream


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="wfstream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_collate_stream_emits_full_chunks(spark, tmpdir):
    rows = [
        Row(
            source_location="L1",
            source_stream_id="S1",
            sampling_rate=10,
            unit="mV",
            observation_time=datetime.datetime(2024, 1, 1, 0, 0, 0)
            + datetime.timedelta(microseconds=i * 500_000),
            values=[float(v) for v in range(i * 5, i * 5 + 5)],
        )
        for i in range(6)  # 30 contiguous samples -> three full 10-chunks
    ]
    batch = spark.createDataFrame(rows)
    src = f"{tmpdir}/in"
    batch.write.parquet(src)

    stream = (
        spark.readStream.schema(batch.schema).parquet(src)
    )
    q = (
        collate_stream(stream, target_samples=10, wait_limit_seconds=300)
        .writeStream.format("memory")
        .queryName("collated_out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .outputMode("append")
        .start()
    )
    # processAllAvailable() can block indefinitely with processing-time
    # timeouts in play; poll the sink instead.
    import time

    try:
        deadline = time.time() + 120
        out = []
        while time.time() < deadline:
            out = spark.sql("select * from collated_out").collect()
            if len(out) >= 3:
                break
            if q.exception():
                raise AssertionError(q.exception())
            time.sleep(1)
    finally:
        q.stop()
    out = sorted(out, key=lambda r: r.observation_datetime)
    # 30 samples buffered -> 3 full chunks; nothing partial (no timeout yet)
    assert [r.n_samples for r in out] == [10, 10, 10]
    assert out[0].values_array == [float(v) for v in range(10)]
    assert all(r.is_final_partial == "full" for r in out)


def test_duplicate_timestamp_routed_to_quarantine(spark, tmpdir):
    """Advice/verdict round 2: a duplicate observation_time is an ERROR
    in the reference (WaveformCollator.java:40-93 throws). The stream
    must surface it as a dead-letter row (reason=DUPLICATE_REASON), keep
    the first occurrence, and leave the collation output unchanged."""
    from emap_spark.streaming.collation import DUPLICATE_REASON

    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            source_location="L1",
            source_stream_id="S1",
            sampling_rate=10,
            unit="mV",
            observation_time=base + datetime.timedelta(microseconds=i * 500_000),
            values=[float(v) for v in range(i * 5, i * 5 + 5)],
        )
        for i in range(4)  # 20 contiguous samples -> two full 10-chunks
    ]
    dup = Row(
        source_location="L1",
        source_stream_id="S1",
        sampling_rate=10,
        unit="mV",
        observation_time=base + datetime.timedelta(microseconds=1 * 500_000),
        values=[99.0] * 5,  # corrupted re-send of message 1
    )
    batch = spark.createDataFrame(rows + [dup])
    src = f"{tmpdir}/in"
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        collate_stream(stream, target_samples=10, wait_limit_seconds=300)
        .writeStream.format("memory")
        .queryName("collated_dup")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .outputMode("append")
        .start()
    )
    import time

    try:
        deadline = time.time() + 120
        out = []
        while time.time() < deadline:
            out = spark.sql("select * from collated_dup").collect()
            if len(out) >= 3:
                break
            if q.exception():
                raise AssertionError(q.exception())
            time.sleep(1)
    finally:
        q.stop()
    quarantined = [r for r in out if r.is_final_partial == DUPLICATE_REASON]
    emitted = sorted(
        (r for r in out if r.is_final_partial != DUPLICATE_REASON),
        key=lambda r: r.observation_datetime,
    )
    # the duplicate landed in the dead-letter channel with its payload
    assert len(quarantined) == 1
    assert quarantined[0].values_array == [99.0] * 5
    assert quarantined[0].observation_datetime == base + datetime.timedelta(
        microseconds=500_000
    )
    # collation output identical to the duplicate-free stream:
    # first occurrence won, 20 samples -> two full chunks
    assert [r.n_samples for r in emitted] == [10, 10]
    assert emitted[0].values_array == [float(v) for v in range(10)]


def test_waveform_socket_stream_loopback(spark, tmpdir):
    """S10 end-to-end over a real TCP socket: a loopback MLLP server
    serves the q97 fixture; waveform_socket_stream (socket source ->
    stateful MLLP reassembly -> column-expression parse) must produce
    exactly the batch parse of the same messages. Spark's socket source
    line-splits on \\r, so each segment arrives as its own row — the
    reassembler is what makes the socket path correct."""
    import socket
    import threading
    import time

    from pyspark.sql import functions as F

    from emap_spark.sources.waveform_hl7 import (
        stream_metadata,
        synthetic_waveform_hl7,
        waveform_from_hl7,
        waveform_socket_stream,
    )

    fixture = synthetic_waveform_hl7(spark, 4)
    messages = [r.hl7 for r in fixture.orderBy("id").collect()]
    payload = b"".join(
        b"\x0b" + m.encode() + b"\r\x1c\r" for m in messages
    )

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve():
        conn, _ = server.accept()
        conn.sendall(payload)
        time.sleep(60)  # keep the connection open while Spark reads
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    meta = stream_metadata(spark)
    expected = sorted(
        (r.source_message_id, r.source_location, str(r.observation_time),
         tuple(r.values), r.rejected)
        for r in waveform_from_hl7(fixture, meta).collect()
    )
    q = (
        waveform_socket_stream(spark, meta, host="127.0.0.1", port=port)
        .writeStream.format("memory")
        .queryName("socket_wf")
        .option("checkpointLocation", f"{tmpdir}/ckpt_sock")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = spark.sql("select * from socket_wf").collect()
            if len(got) >= len(expected):
                break
            if q.exception():
                raise AssertionError(q.exception())
            time.sleep(1)
    finally:
        q.stop()
        server.close()
    actual = sorted(
        (r.source_message_id, r.source_location, str(r.observation_time),
         tuple(r.values), r.rejected)
        for r in got
    )
    assert actual == expected


def test_retain_unemitted_trims_straddling_message():
    """Regression: a message straddling the emitted-chunk boundary must
    keep its unemitted tail samples (was dropped entirely before)."""
    import pandas as pd

    t0 = pd.Timestamp("2024-01-01")
    rate = 10  # 100 ms / sample
    msgs = pd.DataFrame(
        {
            "observation_time": [t0, t0 + pd.Timedelta(milliseconds=500)],
            "values": [[0.0, 1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0, 9.0]],
            "sampling_rate": [rate, rate],
        }
    )
    # an 8-sample chunk was emitted: boundary falls inside message 2
    emitted_until = t0 + pd.Timedelta(milliseconds=800)
    keep = _retain_unemitted(msgs, emitted_until)
    assert len(keep) == 1
    assert list(keep["values"].iloc[0]) == [8.0, 9.0]
    assert keep["observation_time"].iloc[0] == emitted_until
    # fully-emitted boundary: message entirely consumed -> dropped
    keep2 = _retain_unemitted(msgs, t0 + pd.Timedelta(milliseconds=1000))
    assert len(keep2) == 0
    # boundary before everything -> keep all samples untrimmed
    keep3 = _retain_unemitted(msgs, t0)
    assert [len(v) for v in keep3["values"]] == [5, 5]


def test_collate_stream_no_sample_loss_on_straddle(spark, tmpdir):
    """End-to-end: message sizes (5) not dividing target (8) across two
    micro-batches; every input sample must come out exactly once."""
    import time

    def msg(i):
        return Row(
            source_location="L1",
            source_stream_id="S1",
            sampling_rate=10,
            unit="mV",
            observation_time=datetime.datetime(2024, 1, 1, 0, 0, 0)
            + datetime.timedelta(microseconds=i * 500_000),
            values=[float(v) for v in range(i * 5, i * 5 + 5)],
        )

    first = spark.createDataFrame([msg(0), msg(1)])
    src = f"{tmpdir}/in"
    first.write.parquet(src)
    stream = spark.readStream.schema(first.schema).parquet(src)
    q = (
        collate_stream(stream, target_samples=8, wait_limit_seconds=6)
        .writeStream.format("memory")
        .queryName("collated_straddle")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        wrote_second = False
        out = []
        while time.time() < deadline:
            out = spark.sql("select * from collated_straddle").collect()
            if out and not wrote_second:
                # first full chunk (8 samples) emitted; now send message 3
                spark.createDataFrame([msg(2)]).write.mode("append").parquet(src)
                wrote_second = True
            if sum(r.n_samples for r in out) >= 15:
                break
            if q.exception():
                raise AssertionError(q.exception())
            time.sleep(1)
    finally:
        q.stop()
    out = sorted(out, key=lambda r: r.observation_datetime)
    all_vals = [v for r in out for v in r.values_array]
    # 15 input samples, in order, nothing lost at the straddled boundary
    # (samples 8, 9) — THE invariant this test exists for
    assert all_vals == [float(v) for v in range(15)]
    # chunk shape: normally [8, 7] (full chunk + one timeout flush), but
    # on a loaded box the 6 s wait limit can flush the 2-sample straddle
    # remainder BEFORE the poll loop lands message 3 -> [8, 2, 5]; both
    # are correct collations of the arrival order the stream actually
    # saw. Pin the invariants instead of the race: first chunk is the
    # full 8, every later chunk is a timeout flush, nothing else.
    assert out[0].n_samples == 8 and out[0].is_final_partial == "full"
    assert sum(r.n_samples for r in out[1:]) == 7
    assert all(r.is_final_partial == "timeout" for r in out[1:])


def test_waveform_hl7_file_stream_to_collation(spark, tmp_path):
    """S10/S11 -> W1 integration: MLLP-framed HL7 text through the
    file-spool stream substitute, parsed rows collated into arrays."""
    import os

    from emap_spark.sources.waveform_hl7 import (
        stream_metadata,
        synthetic_waveform_hl7,
        waveform_from_hl7,
        waveform_file_stream,
    )
    from emap_spark.streaming.collation import collate_batch

    spool = tmp_path / "spool"
    spool.mkdir()
    msgs = synthetic_waveform_hl7(spark, 8).collect()
    # one MLLP-framed blob per line, mixed two-per-line framing
    with open(spool / "batch1.txt", "w") as fh:
        for k in range(0, len(msgs), 2):
            blobs = "\x0b".join("\x0b" + m.hl7 + "\x1c" for m in msgs[k:k + 2])
            fh.write(blobs.replace("\r", "\r") + "\n")
    meta = stream_metadata(spark)
    stream = waveform_file_stream(spark, meta, str(spool))
    assert stream.isStreaming
    q = (
        stream.filter("rejected IS NULL")
        .writeStream.format("memory")
        .queryName("wf_parsed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from wf_parsed")
    batch = waveform_from_hl7(synthetic_waveform_hl7(spark, 8), meta).filter(
        "rejected IS NULL"
    )
    # stream parse == batch parse, row for row
    assert sorted((r.source_message_id, r.source_stream_id, len(r.values))
                  for r in got.collect()) == sorted(
        (r.source_message_id, r.source_stream_id, len(r.values))
        for r in batch.collect()
    )
    # parsed rows feed the collator directly (schema-compatible)
    collated = collate_batch(
        got.drop("rejected"), target_samples=10
    )
    assert collated.count() > 0
