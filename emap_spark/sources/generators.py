"""Synthetic sources (SURVEY.md §2.1 S12 and test-fixture generation).

waveform_stream: distributed sine-wave generator mirroring the
reference's Hl7Generator (waveform-generator/.../Hl7Generator.java:
107-160, :239 makeSyntheticWaveformMsgs, :264 the sine formula
max * sin(2*pi*f*i/rate)) — built on spark.range so generation scales
linearly with executors, no driver loop.

adt_messages: deterministic ADT event sequences shaped like the
interchange YAML fixtures (A01 admit -> A02 transfers -> A03 discharge)
for merge-engine and location-visit tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.functions.hl7 import tristate_from_hl7


def waveform_stream(
    spark: SparkSession,
    n_patients: int = 30,
    sampling_rate: int = 300,
    seconds: int = 60,
    samples_per_message: int = 5,
    start: str = "2024-01-01 00:00:00",
    frequency_hz: float = 1.0,
    amplitude: float = 100.0,
) -> DataFrame:
    """One (location, stream) per patient emitting sine samples in
    HL7-message-sized chunks (default 5 samples/msg like the reference's
    bedside-monitor feed density).

    Returns WAVEFORM_SCHEMA-shaped rows: messages of `samples_per_message`
    doubles with observation_time at the chunk start.
    """
    msgs_per_patient = (seconds * sampling_rate) // samples_per_message
    base = spark.range(n_patients * msgs_per_patient).select(
        (F.col("id") % n_patients).alias("patient"),
        (F.col("id") / n_patients).cast("long").alias("msg_idx"),
    )
    start_ts = F.lit(start).cast("timestamp_ntz")
    first_sample = F.col("msg_idx") * samples_per_message
    obs_time = F.timestamp_micros(
        F.unix_micros(start_ts.cast("timestamp"))
        + (first_sample * 1_000_000 / sampling_rate).cast("long")
    ).cast("timestamp_ntz")
    # values[k] = amplitude * sin(2 pi f (first_sample + k) / rate)
    k = F.sequence(F.lit(0), F.lit(samples_per_message - 1))
    values = F.transform(
        k,
        lambda i: F.round(
            amplitude
            * F.sin(
                F.lit(2 * math.pi * frequency_hz)
                * (first_sample + i).cast("double")
                / F.lit(float(sampling_rate))
            ),
            6,
        ),
    )
    return base.select(
        F.format_string("wf%010d", F.col("patient") * 10_000_000 + F.col("msg_idx")).alias(
            "source_message_id"
        ),
        F.lit("waveform-generator").alias("source_system"),
        obs_time.alias("valid_from"),
        F.format_string("T%02dE^T%02dE BY02^BY02-%02d", "patient", "patient", "patient").alias(
            "source_location"
        ),
        F.lit(None).cast("string").alias("mapped_location"),
        F.lit("52912").alias("source_stream_id"),
        F.lit("ECG").alias("mapped_stream_description"),
        F.lit(sampling_rate).alias("sampling_rate"),
        F.lit("mV").alias("unit"),
        obs_time.alias("observation_time"),
        values.alias("values"),
    )


def adt_messages(spark: SparkSession, n_patients: int = 10) -> DataFrame:
    """Deterministic admit/transfer/transfer/discharge sequence per
    patient, ADT_SCHEMA-shaped (subset of fields), for engine tests."""
    seqs = []
    for p in range(n_patients):
        mrn = f"MRN{p:05d}"
        enc = f"ENC{p:05d}"
        day = 1 + (p % 20)
        seqs += [
            (f"{p}-1", "ADMIT", mrn, enc, f"2024-01-{day:02d} 08:00:00", f"T{p % 5}E^BY01^BED-1", None),
            (f"{p}-2", "TRANSFER", mrn, enc, f"2024-01-{day:02d} 12:00:00", f"T{p % 5}E^BY02^BED-2", f"T{p % 5}E^BY01^BED-1"),
            (f"{p}-3", "TRANSFER", mrn, enc, f"2024-01-{day:02d} 18:00:00", f"T{p % 5}E^BY03^BED-3", f"T{p % 5}E^BY02^BED-2"),
            (f"{p}-4", "DISCHARGE", mrn, enc, f"2024-01-{day + 1:02d} 10:00:00", f"T{p % 5}E^BY03^BED-3", None),
        ]
    df = spark.createDataFrame(
        seqs,
        "source_message_id string, message_type string, mrn string, visit_number string,"
        " event_occurred string, location string, previous_location string",
    )
    ts_null = tristate_from_hl7(F.lit(None).cast("string"))
    admit = F.col("message_type") == "ADMIT"
    return df.select(
        "source_message_id",
        F.lit("EPIC").alias("source_system"),
        F.col("event_occurred").cast("timestamp_ntz").alias("valid_from"),
        "message_type",
        "mrn",
        F.concat(F.lit("NHS"), F.substring("mrn", 4, 5)).alias("nhs_number"),
        "visit_number",
        tristate_from_hl7(F.when(admit, F.lit("INPATIENT"))).alias("patient_class"),
        tristate_from_hl7(F.col("location")).alias("location"),
        tristate_from_hl7(F.col("previous_location")).alias("previous_location"),
        F.col("event_occurred").cast("timestamp_ntz").alias("event_occurred"),
        F.col("event_occurred").cast("timestamp_ntz").alias("recorded_datetime"),
        F.struct(
            F.when(admit, F.col("event_occurred").cast("timestamp_ntz")).alias("value"),
            F.when(admit, F.lit("SAVE")).otherwise(F.lit("IGNORE")).alias("status"),
        ).alias("admission_datetime"),
        F.struct(
            F.lit(None).cast("timestamp_ntz").alias("value"), F.lit("IGNORE").alias("status")
        ).alias("discharge_datetime"),
        ts_null.alias("discharge_disposition"),
        ts_null.alias("discharge_destination"),
        tristate_from_hl7(F.when(admit, F.concat(F.lit("Given"), F.substring("mrn", 4, 5)))).alias(
            "name_given"
        ),
        tristate_from_hl7(F.when(admit, F.concat(F.lit("Family"), F.substring("mrn", 4, 5)))).alias(
            "name_family"
        ),
        F.struct(
            F.lit(None).cast("timestamp_ntz").alias("value"), F.lit("IGNORE").alias("status")
        ).alias("birth_datetime"),
        tristate_from_hl7(F.when(admit, F.lit("F"))).alias("sex"),
        ts_null.alias("death_indicator"),
        F.struct(
            F.lit(None).cast("timestamp_ntz").alias("value"), F.lit("IGNORE").alias("status")
        ).alias("death_datetime"),
        F.lit(None).cast("string").alias("retired_mrn"),
        F.lit(None).cast("string").alias("retired_visit_number"),
    )
