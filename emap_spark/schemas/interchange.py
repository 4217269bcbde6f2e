"""Typed interchange-message schemas (SURVEY.md §1.1, layer A).

The reference models every optional field as InterchangeValue<T> — a
tri-state {value, status in SAVE/DELETE/IGNORE} merge instruction
(emap-interchange/.../InterchangeValue.java:16-17). We encode it as a
struct column; emap_spark.operators.merge folds it (policy TRISTATE).

Message families mirror EmapOperationMessageProcessor's 24 overloads
(emap-interchange/.../EmapOperationMessageProcessor.java:28-179); the
schemas below cover the families our engine processes, with the shared
envelope (source_message_id, source_system, valid_from) present on all.
"""

from __future__ import annotations

from pyspark.sql import types as T


def tristate_type(value_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("value", value_type),
            T.StructField("status", T.StringType()),  # SAVE | DELETE | IGNORE
        ]
    )


TRISTATE_STRING = tristate_type(T.StringType())
TRISTATE_DOUBLE = tristate_type(T.DoubleType())
TRISTATE_TS = tristate_type(T.TimestampNTZType())


def _envelope() -> list[T.StructField]:
    """Shared message envelope (EmapOperationMessage.java:14-21)."""
    return [
        T.StructField("source_message_id", T.StringType(), False),
        T.StructField("source_system", T.StringType()),
        T.StructField("valid_from", T.TimestampNTZType(), False),
    ]


# ADT family (adt/AdtMessage.java:22-46 shared demographics; subtype via
# message_type: ADMIT/TRANSFER/DISCHARGE/REGISTER/UPDATE_INFO/CANCEL_*,
# MERGE, MOVE_VISIT, CHANGE_IDENTIFIERS, DELETE_PERSON, PENDING_*, SWAP)
ADT_SCHEMA = T.StructType(
    _envelope()
    + [
        T.StructField("message_type", T.StringType(), False),
        T.StructField("mrn", T.StringType()),
        T.StructField("nhs_number", T.StringType()),
        T.StructField("visit_number", T.StringType()),  # encounter
        T.StructField("patient_class", TRISTATE_STRING),
        T.StructField("location", TRISTATE_STRING),  # dept^room^bed
        T.StructField("previous_location", TRISTATE_STRING),
        T.StructField("event_occurred", T.TimestampNTZType()),
        T.StructField("recorded_datetime", T.TimestampNTZType()),
        T.StructField("admission_datetime", TRISTATE_TS),
        T.StructField("discharge_datetime", TRISTATE_TS),
        T.StructField("discharge_disposition", TRISTATE_STRING),
        T.StructField("discharge_destination", TRISTATE_STRING),
        # demographics (CoreDemographic targets)
        T.StructField("name_given", TRISTATE_STRING),
        T.StructField("name_family", TRISTATE_STRING),
        T.StructField("birth_datetime", TRISTATE_TS),
        T.StructField("sex", TRISTATE_STRING),
        T.StructField("death_indicator", TRISTATE_STRING),
        T.StructField("death_datetime", TRISTATE_TS),
        # merge / identity messages
        T.StructField("retired_mrn", T.StringType()),
        T.StructField("retired_visit_number", T.StringType()),
    ]
)

# Flowsheet / vital-sign observation (visit_observations/Flowsheet.java:26-89)
FLOWSHEET_SCHEMA = T.StructType(
    _envelope()
    + [
        T.StructField("mrn", T.StringType()),
        T.StructField("visit_number", T.StringType()),
        T.StructField("interface_id", T.StringType(), False),
        T.StructField("observation_datetime", T.TimestampNTZType(), False),
        T.StructField("value_type", T.StringType()),  # NUMERIC | TEXT | DATE
        T.StructField("numeric_value", TRISTATE_DOUBLE),
        T.StructField("string_value", TRISTATE_STRING),
        T.StructField("date_value", TRISTATE_TS),
        T.StructField("unit", TRISTATE_STRING),
        T.StructField("comment", TRISTATE_STRING),
    ]
)

# Microbiology isolate nested in a LAB_ISOLATE result
# (lab/LabIsolateMsg.java:18-47: identity by isolateId because code and
# name can change; sensitivities are themselves result-shaped — here
# collapsed to the fields the star tables keep: agent = the
# sensitivity result's stringValue, sensitivity = its abnormalFlag,
# LabResultController.java:190-213)
LAB_SENSITIVITY_TYPE = T.StructType(
    [
        T.StructField("agent", T.StringType(), False),
        T.StructField("sensitivity", T.StringType()),  # S | I | R
        T.StructField("result_time", T.TimestampNTZType()),
    ]
)

LAB_ISOLATE_TYPE = T.StructType(
    [
        T.StructField("isolate_id", T.StringType(), False),
        T.StructField("isolate_code", T.StringType()),
        T.StructField("isolate_name", T.StringType()),
        T.StructField("culture_type", TRISTATE_STRING),
        T.StructField("quantity", TRISTATE_STRING),
        T.StructField("clinical_information", TRISTATE_STRING),
        T.StructField("sensitivities", T.ArrayType(LAB_SENSITIVITY_TYPE)),
    ]
)

# Lab order with nested results (lab/LabOrderMsg.java:29-67: List<LabResultMsg>
# + Map<String,String> questions)
LAB_RESULT_TYPE = T.StructType(
    [
        T.StructField("test_code", T.StringType(), False),
        T.StructField("value_type", T.StringType()),  # NUMERIC|TEXT|PDF|LAB_ISOLATE
        T.StructField("numeric_value", T.DoubleType()),
        T.StructField("result_operator", T.StringType()),  # < > =
        T.StructField("string_value", T.StringType()),
        T.StructField("bytes_value", T.BinaryType()),
        T.StructField("units", T.StringType()),
        T.StructField("range_low", T.DoubleType()),
        T.StructField("range_high", T.DoubleType()),
        T.StructField("abnormal_flag", T.StringType()),
        T.StructField("result_time", T.TimestampNTZType()),
        T.StructField("isolate", LAB_ISOLATE_TYPE),  # LAB_ISOLATE results only
    ]
)

LAB_ORDER_SCHEMA = T.StructType(
    _envelope()
    + [
        T.StructField("mrn", T.StringType()),
        T.StructField("visit_number", T.StringType()),
        T.StructField("epic_order_number", TRISTATE_STRING),
        T.StructField("external_lab_number", T.StringType()),  # sample key
        T.StructField("battery_code", T.StringType(), False),
        T.StructField("coding_system", T.StringType()),  # WINPATH|CO_PATH|ABL90|...
        T.StructField("order_datetime", TRISTATE_TS),
        T.StructField("sample_received", TRISTATE_TS),
        T.StructField("collection_datetime", T.TimestampNTZType()),
        T.StructField("results", T.ArrayType(LAB_RESULT_TYPE)),
        T.StructField("questions", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Patient conditions (PatientConditionMessage subclasses
# PatientInfection / PatientProblem / PatientAllergy; reactions only on
# allergies — PatientAllergy.java getReactions, consumed by
# PatientConditionController.java:213-240 replace-set semantics)
CONDITION_SCHEMA = T.StructType(
    _envelope()
    + [
        T.StructField("mrn", T.StringType(), False),
        T.StructField("visit_number", T.StringType()),
        T.StructField("condition_type", T.StringType(), False),
        T.StructField("internal_id", T.StringType(), False),
        T.StructField("status", TRISTATE_STRING),
        T.StructField("onset_date", T.DateType()),
        T.StructField("resolution_date", T.DateType()),
        T.StructField("comment", TRISTATE_STRING),
        T.StructField("severity", TRISTATE_STRING),
        T.StructField("reactions", T.ArrayType(T.StringType())),
        T.StructField("is_delete", T.BooleanType(), False),
    ]
)

# High-frequency waveform (visit_observations/WaveformMessage.java:26-68)
WAVEFORM_SCHEMA = T.StructType(
    _envelope()
    + [
        T.StructField("source_location", T.StringType(), False),
        T.StructField("mapped_location", T.StringType()),
        T.StructField("source_stream_id", T.StringType(), False),
        T.StructField("mapped_stream_description", T.StringType()),
        T.StructField("sampling_rate", T.IntegerType(), False),
        T.StructField("unit", T.StringType()),
        T.StructField("observation_time", T.TimestampNTZType(), False),
        T.StructField("values", T.ArrayType(T.DoubleType()), False),
    ]
)
