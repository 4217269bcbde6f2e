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


def lab_order_messages(spark: SparkSession, n_orders: int = 20) -> DataFrame:
    """Deterministic LAB_ORDER_SCHEMA-shaped messages: each order arrives
    twice (initial WinPath-style order with nested results, then a newer
    update correcting one result + adding a PDF report); every 5th order
    later gets the epic delete sentinel (LabOrderController delete path)."""
    from emap_spark.schemas.interchange import LAB_ORDER_SCHEMA
    import datetime

    def res(code, vtype, num=None, op=None, text=None, data=None, t=None):
        return {
            "test_code": code,
            "value_type": vtype,
            "numeric_value": num,
            "result_operator": op,
            "string_value": text,
            "bytes_value": data,
            "units": "mmol/L" if vtype == "NUMERIC" else None,
            "range_low": 1.0 if vtype == "NUMERIC" else None,
            "range_high": 9.0 if vtype == "NUMERIC" else None,
            "abnormal_flag": None,
            "result_time": t,
        }

    rows = []
    for i in range(n_orders):
        day = 1 + (i % 25)
        t0 = datetime.datetime(2024, 2, day, 9, 0, 0)
        t1 = datetime.datetime(2024, 2, day, 15, 0, 0)
        lab_no = f"LAB{i:06d}"
        base = {
            "source_system": "WinPath",
            "mrn": f"MRN{i % 7:05d}",
            "visit_number": f"ENC{i % 7:05d}",
            "external_lab_number": lab_no,
            "battery_code": ["FBC", "UE", "LFT"][i % 3],
            "coding_system": "WINPATH",
            "collection_datetime": t0,
            "questions": {"clinical details": f"query {i}"},
        }
        rows.append(
            {
                **base,
                "source_message_id": f"lab-{i}-0",
                "valid_from": t0,
                "epic_order_number": {"value": f"EPIC{i:06d}", "status": "SAVE"},
                "order_datetime": {"value": t0, "status": "SAVE"},
                "sample_received": {"value": t0, "status": "SAVE"},
                "results": [
                    res("NA", "NUMERIC", num=140.0 + i % 5, op="=", t=t0),
                    res("COMM", "TEXT", text=f"note {i}", t=t0),
                ],
            }
        )
        rows.append(
            {
                **base,
                "source_message_id": f"lab-{i}-1",
                "valid_from": t1,
                "epic_order_number": {"value": None, "status": "IGNORE"},
                "order_datetime": {"value": None, "status": "IGNORE"},
                "sample_received": {"value": None, "status": "IGNORE"},
                "results": [
                    res("NA", "NUMERIC", num=141.5 + i % 5, op="=", t=t1),
                    res("PDFR", "PDF", data=bytes([i % 256]) * 4, t=t1),
                ],
            }
        )
        if i % 5 == 0:
            t2 = datetime.datetime(2024, 2, day, 18, 0, 0)
            rows.append(
                {
                    **base,
                    "source_message_id": f"lab-{i}-2",
                    "valid_from": t2,
                    "epic_order_number": {"value": None, "status": "DELETE"},
                    "order_datetime": {"value": None, "status": "IGNORE"},
                    "sample_received": {"value": None, "status": "IGNORE"},
                    "results": [],
                }
            )
    return spark.createDataFrame(rows, LAB_ORDER_SCHEMA)


def micro_lab_messages(spark: SparkSession, n_orders: int = 12) -> DataFrame:
    """Deterministic microbiology orders (D11): each culture order
    arrives twice — the initial report carries an isolate with two
    sensitivities (AMOX resistant, GENT sensitive); the follow-up
    updates the isolate's quantity + clinical information and flips
    AMOX to sensitive (newer-wins on the sensitivity child)."""
    from emap_spark.schemas.interchange import LAB_ORDER_SCHEMA
    import datetime

    def tri(v=None):
        return {"value": v, "status": "SAVE" if v is not None else "IGNORE"}

    rows = []
    for i in range(n_orders):
        day = 1 + (i % 25)
        t0 = datetime.datetime(2024, 4, day, 9, 0, 0)
        t1 = datetime.datetime(2024, 4, day, 18, 0, 0)
        code = "ECOLI" if i % 2 == 0 else "SAUR"
        name = "Escherichia coli" if i % 2 == 0 else "Staphylococcus aureus"
        base = {
            "source_system": "WinPath",
            "mrn": f"MRN{i % 5:05d}",
            "visit_number": f"ENC{i % 5:05d}",
            "external_lab_number": f"MICRO{i:05d}",
            "battery_code": "CULTURE",
            "coding_system": "WINPATH",
            "collection_datetime": t0,
            "questions": {},
            "epic_order_number": tri(f"EPICM{i:05d}"),
            "order_datetime": tri(t0),
            "sample_received": tri(t0),
        }

        def iso(quantity, clinical, sens):
            return {
                "isolate_id": f"ISO{i:05d}",
                "isolate_code": code,
                "isolate_name": name,
                "culture_type": tri("aerobic"),
                "quantity": tri(quantity),
                "clinical_information": tri(clinical),
                "sensitivities": sens,
            }

        def isolate_result(isolate, t):
            return {
                "test_code": "ISOLATE",
                "value_type": "LAB_ISOLATE",
                "numeric_value": None,
                "result_operator": None,
                "string_value": isolate["isolate_code"],
                "bytes_value": None,
                "units": None,
                "range_low": None,
                "range_high": None,
                "abnormal_flag": None,
                "result_time": t,
                "isolate": isolate,
            }

        rows.append(
            {
                **base,
                "source_message_id": f"micro-{i}-0",
                "valid_from": t0,
                "results": [
                    isolate_result(
                        iso("10,000+", None, [
                            {"agent": "AMOX", "sensitivity": "R", "result_time": t0},
                            {"agent": "GENT", "sensitivity": "S", "result_time": t0},
                        ]),
                        t0,
                    )
                ],
            }
        )
        rows.append(
            {
                **base,
                "source_message_id": f"micro-{i}-1",
                "valid_from": t1,
                "results": [
                    isolate_result(
                        iso("100,000+", f"wound swab {i}", [
                            {"agent": "AMOX", "sensitivity": "S", "result_time": t1},
                        ]),
                        t1,
                    )
                ],
            }
        )
    return spark.createDataFrame(rows, LAB_ORDER_SCHEMA)


def condition_messages(spark: SparkSession, n: int = 15) -> DataFrame:
    """Deterministic CONDITION_SCHEMA messages (D12): each patient gets
    one allergy whose reaction set is REPLACED by a follow-up (rash+hives
    -> rash only), one infection that is later hoover-deleted for every
    3rd patient, and one problem linked to two visits."""
    from emap_spark.schemas.interchange import CONDITION_SCHEMA
    import datetime

    def tri(v=None):
        return {"value": v, "status": "SAVE" if v is not None else "IGNORE"}

    rows = []
    for i in range(n):
        mrn = f"MRN{i:05d}"
        day = 1 + (i % 25)
        t0 = datetime.datetime(2024, 5, day, 9, 0, 0)
        t1 = datetime.datetime(2024, 5, day, 15, 0, 0)
        t2 = datetime.datetime(2024, 5, day, 20, 0, 0)
        base = {"source_system": "EPIC", "mrn": mrn, "visit_number": None,
                "status": tri(), "onset_date": None, "resolution_date": None,
                "comment": tri(), "severity": tri(), "reactions": None,
                "is_delete": False}
        # allergy: reactions replaced wholesale by the newer message
        rows.append({**base, "source_message_id": f"al-{i}-0", "valid_from": t0,
                     "condition_type": "PATIENT_ALLERGY", "internal_id": f"ALG{i}",
                     "status": tri("ACTIVE"), "severity": tri("HIGH"),
                     "reactions": ["rash", "hives"],
                     "onset_date": datetime.date(2024, 5, day)})
        rows.append({**base, "source_message_id": f"al-{i}-1", "valid_from": t1,
                     "condition_type": "PATIENT_ALLERGY", "internal_id": f"ALG{i}",
                     "reactions": ["rash"]})
        # infection: added, then hoover-deleted for every 3rd patient
        rows.append({**base, "source_message_id": f"inf-{i}-0", "valid_from": t0,
                     "condition_type": "PATIENT_INFECTION", "internal_id": f"INF{i}",
                     "status": tri("ACTIVE"),
                     "visit_number": f"ENC{i:05d}A"})
        if i % 3 == 0:
            rows.append({**base, "source_message_id": f"inf-{i}-1", "valid_from": t2,
                         "condition_type": "PATIENT_INFECTION",
                         "internal_id": f"INF{i}", "is_delete": True})
        # problem linked to two visits
        for j, t in ((0, t0), (1, t1)):
            rows.append({**base, "source_message_id": f"pr-{i}-{j}", "valid_from": t,
                         "condition_type": "PATIENT_PROBLEM", "internal_id": f"PRB{i}",
                         "status": tri("ACTIVE"), "comment": tri(f"problem {i}"),
                         "visit_number": f"ENC{i:05d}{'A' if j == 0 else 'B'}"})
    return spark.createDataFrame(rows, CONDITION_SCHEMA)


def flowsheet_messages(spark: SparkSession, n: int = 30) -> DataFrame:
    """Deterministic FLOWSHEET_SCHEMA vitals (ORU^R01 shape, S7)."""
    from emap_spark.schemas.interchange import FLOWSHEET_SCHEMA
    import datetime

    rows = []
    for i in range(n):
        t = datetime.datetime(2024, 3, 1 + (i % 27), 8 + (i % 12), 0, 0)
        vt = ["NUMERIC", "TEXT", "DATE"][i % 3]
        rows.append(
            {
                "source_message_id": f"fs-{i}",
                "source_system": "EPIC",
                "valid_from": t,
                "mrn": f"MRN{i % 5:05d}",
                "visit_number": f"ENC{i % 5:05d}",
                "interface_id": ["HR", "BP", "NOTE"][i % 3],
                "observation_datetime": t,
                "value_type": vt,
                "numeric_value": {"value": 60.0 + i if vt == "NUMERIC" else None,
                                   "status": "SAVE" if vt == "NUMERIC" else "IGNORE"},
                "string_value": {"value": f"obs {i}" if vt == "TEXT" else None,
                                  "status": "SAVE" if vt == "TEXT" else "IGNORE"},
                "date_value": {"value": t if vt == "DATE" else None,
                                "status": "SAVE" if vt == "DATE" else "IGNORE"},
                "unit": {"value": "bpm" if vt == "NUMERIC" else None,
                          "status": "SAVE" if vt == "NUMERIC" else "IGNORE"},
                "comment": {"value": None, "status": "IGNORE"},
            }
        )
    return spark.createDataFrame(rows, FLOWSHEET_SCHEMA)


def advance_decision_messages(spark: SparkSession, n: int = 12) -> DataFrame:
    """D14 fixtures: each decision arrives (requested), gets a status
    update; every 3rd is cancelled, every 4th closes on discharge."""
    import datetime

    rows = []
    for i in range(n):
        day = 1 + (i % 25)
        t0 = datetime.datetime(2024, 7, day, 9, 0, 0)
        t1 = datetime.datetime(2024, 7, day, 15, 0, 0)
        base = {
            "source_system": "EPIC",
            "internal_id": f"AD{i:05d}",
            "advance_decision_type": "DNACPR" if i % 2 == 0 else "NOT_FOR_ESCALATION",
            "encounter": f"ENC{i % 5:05d}",
            "mrn": f"MRN{i % 5:05d}",
        }
        rows.append({**base, "source_message_id": f"ad-{i}-0", "valid_from": t0,
                     "cancelled": False, "closed_due_to_discharge": False,
                     "status_change_datetime": t0, "requested_datetime": t0})
        rows.append({**base, "source_message_id": f"ad-{i}-1", "valid_from": t1,
                     "cancelled": i % 3 == 0, "closed_due_to_discharge": i % 4 == 0,
                     # EPIC resends the ORIGINAL requested time on updates
                     "status_change_datetime": t1, "requested_datetime": t0})
    return spark.createDataFrame(
        rows,
        "source_message_id string, source_system string, valid_from timestamp_ntz,"
        " internal_id string, advance_decision_type string, encounter string,"
        " mrn string, cancelled boolean, closed_due_to_discharge boolean,"
        " status_change_datetime timestamp_ntz, requested_datetime timestamp_ntz",
    )
