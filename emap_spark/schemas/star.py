"""Star-schema table definitions (SURVEY.md §1.1 layer B / §1.2-1.3).

Wide, fixed-schema tables mirroring the reference's 31 documented tables
(docs/data_dictionary/tables.md:10-616); every mutable table carries the
TemporalCore columns valid_from/stored_from (TemporalCore.java:30-32)
plus our is_deleted tombstone, and gets an audit mirror derived
programmatically (the reference generates them with an annotation
processor, AuditTableProcessor.java:62-130 — we just append
valid_until/stored_until, AuditCore.java:33-35).
"""

from __future__ import annotations

from pyspark.sql import types as T

_TEMPORAL = [
    T.StructField("valid_from", T.TimestampNTZType(), False),
    T.StructField("stored_from", T.TimestampNTZType(), False),
    T.StructField("is_deleted", T.BooleanType(), False),
]


def _table(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields) + _TEMPORAL)


def audit_schema(table: T.StructType) -> T.StructType:
    """Audit mirror = table + validUntil/storedUntil (AuditCore.java:33-35)."""
    return T.StructType(
        table.fields
        + [
            T.StructField("valid_until", T.TimestampNTZType()),
            T.StructField("stored_until", T.TimestampNTZType()),
        ]
    )


STAR_TABLES: dict[str, T.StructType] = {
    # identity (Mrn.java:50-82, MrnToLive.java:36-63, HospitalVisit.java:41-118)
    "mrn": _table(
        T.StructField("mrn", T.StringType()),
        T.StructField("nhs_number", T.StringType()),
        T.StructField("research_opt_out", T.BooleanType()),
        T.StructField("source_system", T.StringType()),
    ),
    "mrn_to_live": _table(
        T.StructField("mrn", T.StringType(), False),
        T.StructField("live_mrn", T.StringType(), False),
    ),
    "core_demographic": _table(
        T.StructField("mrn", T.StringType(), False),
        T.StructField("name_given", T.StringType()),
        T.StructField("name_family", T.StringType()),
        T.StructField("birth_date", T.DateType()),
        T.StructField("sex", T.StringType()),
        T.StructField("alive", T.BooleanType()),
        T.StructField("death_datetime", T.TimestampNTZType()),
    ),
    "hospital_visit": _table(
        T.StructField("encounter", T.StringType(), False),
        T.StructField("mrn", T.StringType(), False),
        T.StructField("patient_class", T.StringType()),
        T.StructField("presentation_datetime", T.TimestampNTZType()),
        T.StructField("admission_datetime", T.TimestampNTZType()),
        T.StructField("discharge_datetime", T.TimestampNTZType()),
        T.StructField("discharge_disposition", T.StringType()),
        T.StructField("discharge_destination", T.StringType()),
        T.StructField("source_system", T.StringType()),
    ),
    # movement (Location flat string, LocationVisit interval rows)
    "location": _table(
        T.StructField("location_string", T.StringType(), False),
        T.StructField("department", T.StringType()),
        T.StructField("room", T.StringType()),
        T.StructField("bed", T.StringType()),
    ),
    "location_visit": _table(
        T.StructField("encounter", T.StringType(), False),
        T.StructField("location_string", T.StringType(), False),
        T.StructField("admission_datetime", T.TimestampNTZType()),
        T.StructField("discharge_datetime", T.TimestampNTZType()),
        T.StructField("inferred_admission", T.BooleanType()),
        T.StructField("inferred_discharge", T.BooleanType()),
    ),
    # observations (VisitObservation.java:62-95, Waveform.java:87-111)
    "visit_observation": _table(
        T.StructField("encounter", T.StringType(), False),
        T.StructField("observation_type", T.StringType(), False),
        T.StructField("observation_datetime", T.TimestampNTZType(), False),
        T.StructField("value_as_real", T.DoubleType()),
        T.StructField("value_as_text", T.StringType()),
        T.StructField("value_as_date", T.DateType()),
        T.StructField("unit", T.StringType()),
        T.StructField("comment", T.StringType()),
    ),
    "waveform": _table(
        T.StructField("source_location", T.StringType(), False),
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("encounter", T.StringType()),  # nullable: orphan samples
        T.StructField("observation_datetime", T.TimestampNTZType(), False),
        T.StructField("sampling_rate", T.IntegerType()),
        T.StructField("unit", T.StringType()),
        T.StructField("values_array", T.ArrayType(T.DoubleType()), False),
    ),
    # labs (LabOrder.java:47-103, LabResult.java:44-131)
    "lab_sample": _table(
        T.StructField("external_lab_number", T.StringType(), False),
        T.StructField("mrn", T.StringType()),
        T.StructField("collection_datetime", T.TimestampNTZType()),
        T.StructField("sample_received", T.TimestampNTZType()),
    ),
    "lab_order": _table(
        T.StructField("external_lab_number", T.StringType(), False),
        T.StructField("battery_code", T.StringType(), False),
        T.StructField("encounter", T.StringType()),
        T.StructField("epic_order_number", T.StringType()),
        T.StructField("order_datetime", T.TimestampNTZType()),
        T.StructField("source_system", T.StringType()),
    ),
    "lab_result": _table(
        T.StructField("external_lab_number", T.StringType(), False),
        T.StructField("battery_code", T.StringType(), False),
        T.StructField("test_code", T.StringType(), False),
        T.StructField("value_type", T.StringType()),
        T.StructField("value_as_real", T.DoubleType()),
        T.StructField("result_operator", T.StringType()),
        T.StructField("value_as_text", T.StringType()),
        T.StructField("value_as_bytes", T.BinaryType()),
        T.StructField("units", T.StringType()),
        T.StructField("range_low", T.DoubleType()),
        T.StructField("range_high", T.DoubleType()),
        T.StructField("abnormal_flag", T.StringType()),
        T.StructField("result_last_modified", T.TimestampNTZType()),
    ),
}
