"""True Structured Streaming test for collate_stream: file source ->
applyInPandasWithState -> memory sink, mirroring the reference's live
waveform path (§3.2)."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import Row

from emap_spark.streaming.collation import collate_stream


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
