"""W1/W2: waveform collation — the reference's stateful stream operator
(waveform-reader/.../WaveformCollator.java:40-311): keyed by
(source_location, stream_id), buffer out-of-order sample messages,
emit merged rows when >= target samples are gapless and contiguous
(expected next ts = prev + n/sampling_rate with rounding tolerance,
checkGap :269-311) or when the oldest data exceeds the wait limit;
never bridge a gap; duplicate timestamps are an error.

Two execution modes share one pandas core:
  collate_batch    — applyInPandas over bounded history (replay/tests)
  collate_stream   — applyInPandasWithState inside readStream (live)

Scale notes: state is per (location, stream) key — hash-partitioned
across executors; each key's buffer holds < target+rate*wait samples
(bounded). Arrow moves arrays in columnar batches; the pandas loop
touches only one key's buffer at a time.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# Spark's Python workers don't necessarily have this package on their
# sys.path (the driver process may run from anywhere). Serialize this
# module's functions by value so pandas-UDF closures are self-contained.
try:  # pyspark serializes closures with ITS vendored cloudpickle
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - best effort
    try:
        import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass

TARGET_SAMPLES = 3000  # 10 s @ 300 Hz (waveform_hf_data.md:66-79)
GAP_TOLERANCE_US = 2_000  # rounding tolerance on expected next ts

COLLATED_SCHEMA = StructType(
    [
        StructField("source_location", StringType()),
        StructField("source_stream_id", StringType()),
        StructField("sampling_rate", IntegerType()),
        StructField("unit", StringType()),
        StructField("observation_datetime", TimestampNTZType()),
        StructField("n_samples", LongType()),
        StructField("values_array", ArrayType(DoubleType())),
        StructField("is_final_partial", StringType()),  # 'full'|'timeout'|'gap'
    ]
)


DUPLICATE_REASON = "quarantined_duplicate_ts"


def _collate_key(
    pdf: pd.DataFrame,
    target_samples: int,
    flush_all: bool,
) -> list[dict]:
    """Collate one key's messages (already one (location, stream) group).

    Returns emitted rows. A duplicate timestamp is an ERROR in the
    reference (WaveformCollator.java:40-93 throws); here the duplicate
    message is emitted as a K3 dead-letter row tagged
    is_final_partial=DUPLICATE_REASON (first occurrence wins the
    collation) instead of killing the stream — a corrupted feed is
    surfaced, never silently "repaired".
    """
    # equal timestamps: deterministic content tiebreak (row order after a
    # shuffle is arbitrary; lexicographically-smallest payload wins the
    # collation so the outcome is permutation-invariant like the rest of
    # the engine — the reference simply throws, either payload "losing"
    # is equally valid)
    pdf = pdf.assign(__vk=pdf["values"].map(tuple)).sort_values(
        ["observation_time", "__vk"], kind="stable"
    )
    dup_mask = pdf.duplicated(subset=["observation_time"], keep="first")
    dups = pdf[dup_mask]
    pdf = pdf[~dup_mask]
    if pdf.empty and dups.empty:
        return []
    quarantined: list[dict] = [
        {
            "source_location": loc,
            "source_stream_id": sid,
            "sampling_rate": int(rate),
            "unit": unit,
            "observation_datetime": ts,
            "n_samples": len(vals),
            "values_array": [float(v) for v in vals],
            "is_final_partial": DUPLICATE_REASON,
        }
        for loc, sid, rate, unit, ts, vals in zip(
            dups["source_location"], dups["source_stream_id"],
            dups["sampling_rate"], dups["unit"],
            dups["observation_time"], dups["values"],
        )
    ]
    if pdf.empty:
        return quarantined
    rate = int(pdf["sampling_rate"].iloc[0])
    unit = pdf["unit"].iloc[0]
    loc = pdf["source_location"].iloc[0]
    sid = pdf["source_stream_id"].iloc[0]
    sample_us = 1_000_000.0 / rate

    # Vectorized collation (the per-sample Python loop dominated the
    # waveform path — 540k floats through list.extend): gap boundaries
    # come from one numpy comparison of each message's start vs the
    # previous message's expected end (checkGap :269-311, never bridge);
    # samples live in ONE concatenated array and chunks are slices.
    import numpy as np

    ts_ns = pdf["observation_time"].to_numpy("datetime64[ns]").astype("int64")
    ts_us = ts_ns // 1000
    arrays = [np.asarray(v, dtype=np.float64) for v in pdf["values"]]
    counts = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
    vals = np.concatenate(arrays) if arrays else np.empty(0)
    ends_us = ts_us + counts * sample_us
    gap = np.abs(ts_us[1:] - ends_us[:-1]) > GAP_TOLERANCE_US
    run_starts = np.flatnonzero(np.concatenate([[True], gap]))  # msg idx
    sample_offsets = np.concatenate([[0], np.cumsum(counts)])

    out: list[dict] = quarantined
    chunk_td = pd.Timedelta(microseconds=target_samples * sample_us)

    def row(start_ts, chunk: np.ndarray, reason: str) -> dict:
        return {
            "source_location": loc,
            "source_stream_id": sid,
            "sampling_rate": rate,
            "unit": unit,
            "observation_datetime": start_ts,
            "n_samples": len(chunk),
            "values_array": chunk,
            "is_final_partial": reason,
        }

    for r, start_msg in enumerate(run_starts):
        last_run = r == len(run_starts) - 1
        end_msg = len(counts) if last_run else run_starts[r + 1]
        lo, hi = sample_offsets[start_msg], sample_offsets[end_msg]
        run_vals = vals[lo:hi]
        chunk_start = pdf["observation_time"].iloc[start_msg]
        pos = 0
        while len(run_vals) - pos >= target_samples:
            out.append(row(chunk_start, run_vals[pos : pos + target_samples], "full"))
            pos += target_samples
            chunk_start = chunk_start + chunk_td
        rem = len(run_vals) - pos
        if rem and (not last_run or flush_all):
            # a gap closes the previous run's remainder; end-of-input
            # flushes the tail only when the wait limit says so
            out.append(row(chunk_start, run_vals[pos:], "gap" if not last_run else "timeout"))
    return out


def collate_batch(
    messages: DataFrame,
    target_samples: int = TARGET_SAMPLES,
    flush_all: bool = True,
) -> DataFrame:
    """Bounded-input collation (replay mode): groupBy key -> applyInPandas.

    flush_all=True emits trailing partial runs (end-of-replay = wait
    limit exceeded for everything).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = _collate_key(pdf, target_samples, flush_all)
        return pd.DataFrame(rows, columns=[f.name for f in COLLATED_SCHEMA.fields])

    return (
        messages.repartition("source_location", "source_stream_id")
        .groupBy("source_location", "source_stream_id")
        .applyInPandas(fn, COLLATED_SCHEMA)
    )


def _retain_unemitted(new: pd.DataFrame, emitted_until) -> pd.DataFrame:
    """Buffer retention after emitting chunks: keep every unemitted sample.

    A message straddling the emitted-chunk boundary keeps its unemitted
    tail — trim the already-emitted leading samples and advance its
    timestamp accordingly (the reference WaveformCollator never discards
    buffered samples; a naive ``ts >= emitted_until`` filter dropped the
    straddling message's tail)."""
    if emitted_until is None:
        return new
    rate = int(new["sampling_rate"].iloc[0])
    sample_us = 1_000_000.0 / rate
    eu_us = emitted_until.value // 1000
    kept_ts: list = []
    kept_vals: list = []
    for ts, vals in zip(new["observation_time"], new["values"]):
        vals = list(vals)
        n_drop = int(round((eu_us - ts.value // 1000) / sample_us))
        if n_drop >= len(vals):
            continue  # fully emitted
        if n_drop > 0:
            vals = vals[n_drop:]
            ts = ts + pd.Timedelta(microseconds=n_drop * sample_us)
        kept_ts.append(ts)
        kept_vals.append(vals)
    out = pd.DataFrame(
        {
            "observation_time": pd.Series(kept_ts, dtype="datetime64[ns]"),
            "values": pd.Series(kept_vals, dtype=object),
        }
    )
    out["sampling_rate"] = rate
    return out


def collate_stream(
    messages: DataFrame,
    target_samples: int = TARGET_SAMPLES,
    wait_limit_seconds: int = 60,
):
    """Structured Streaming collation via applyInPandasWithState
    (GroupStateTimeout.ProcessingTimeTimeout implements the wait limit:
    a key with no new data for wait_limit_seconds flushes its buffer,
    mirroring Hl7ParseAndQueue.collateAndSend's 10 s drain cadence W2).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    buffer_schema = (
        "obs_us array<long>, vals array<array<double>>, rate int, unit string"
    )

    def fn(
        key,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        loc, sid = key
        rows: list[dict] = []
        if state.hasTimedOut:
            obs_us, vals, rate, unit = state.get
            pdf = pd.DataFrame(
                {
                    "source_location": loc,
                    "source_stream_id": sid,
                    "sampling_rate": rate,
                    "unit": unit,
                    "observation_time": pd.to_datetime(pd.Series(obs_us), unit="us"),
                    "values": pd.Series(vals),
                }
            )
            rows = _collate_key(pdf, target_samples, flush_all=True)
            state.remove()
        else:
            new = pd.concat(list(pdfs), ignore_index=True)
            if state.exists:
                obs_us, vals, rate, unit = state.get
                old = pd.DataFrame(
                    {
                        "source_location": loc,
                        "source_stream_id": sid,
                        "sampling_rate": rate,
                        "unit": unit,
                        "observation_time": pd.to_datetime(pd.Series(obs_us), unit="us"),
                        "values": pd.Series(vals),
                    }
                )
                new = pd.concat([old, new[old.columns]], ignore_index=True)
            emitted = _collate_key(new, target_samples, flush_all=False)
            rows = emitted
            # what remains buffered = samples after the last emitted chunk
            # (dead-letter duplicate rows are reports, not emissions)
            real = [r for r in emitted if r["is_final_partial"] != DUPLICATE_REASON]
            emitted_until = (
                max(
                    r["observation_datetime"]
                    + pd.Timedelta(seconds=r["n_samples"] / r["sampling_rate"])
                    for r in real
                )
                if real
                else None
            )
            keep = _retain_unemitted(new, emitted_until)
            # same deterministic tiebreak as _collate_key (smallest
            # payload wins): a duplicate pair in the retained zone must
            # keep the row the collation would later declare the winner,
            # not whichever landed first in frame order — otherwise the
            # buffer can hold the very payload that was just emitted as
            # a dead-letter row and silently drop the declared winner
            keep = (
                keep.assign(__vk=keep["values"].map(tuple))
                .sort_values(["observation_time", "__vk"], kind="stable")
                .drop_duplicates(subset=["observation_time"], keep="first")
                .drop(columns="__vk")
            )
            # pure-Python values only: numpy scalars in the state tuple fail
            # JVM-side unpickling (razorvine has no numpy.dtype constructor)
            state.update(
                (
                    [int(t.value // 1000) for t in keep["observation_time"]],
                    [[float(x) for x in v] for v in keep["values"]],
                    int(new["sampling_rate"].iloc[0]),
                    str(new["unit"].iloc[0]),
                )
            )
            state.setTimeoutDuration(wait_limit_seconds * 1000)
        yield pd.DataFrame(rows, columns=[f.name for f in COLLATED_SCHEMA.fields])

    return (
        messages.groupBy("source_location", "source_stream_id")
        .applyInPandasWithState(
            fn,
            COLLATED_SCHEMA,
            buffer_schema,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def gap_report(collated: DataFrame) -> DataFrame:
    """Q6: per-stream gap/spacing validation over collated rows."""
    from pyspark.sql import Window as W

    w = W.partitionBy("source_location", "source_stream_id").orderBy("observation_datetime")
    end_us = F.unix_micros(F.col("observation_datetime").cast("timestamp")) + (
        F.col("n_samples") * 1_000_000 / F.col("sampling_rate")
    ).cast("long")
    start_us = F.unix_micros(F.col("observation_datetime").cast("timestamp"))
    prev_end = F.lag(end_us).over(w)
    return (
        collated.select(
            "source_location",
            "source_stream_id",
            start_us.alias("start_us"),
            end_us.alias("end_us"),
            prev_end.alias("prev_end_us"),
        )
        .filter(F.col("prev_end_us").isNotNull())
        .withColumn("gap_us", F.col("start_us") - F.col("prev_end_us"))
        .filter(F.abs(F.col("gap_us")) > GAP_TOLERANCE_US)
    )
