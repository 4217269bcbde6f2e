"""D8 flowsheets -> visit_observation (VisitObservationController.java:
109-124, 305-324) and D12-D16 condition/consult/form shapes.

Flowsheet key = (visit, observation type, observation time); typed value
dispatch NUMERIC/TEXT/DATE into the three value columns; newer-wins on
the message's own event time.

Conditions (D12) key = (mrn, condition_type, internal_id) with
delete-then-readd support via tombstones; consults (D13) and advance
decisions (D14) share the internal-id upsert shape; questions (D16) are
a dimension keyed by text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from emap_spark.operators.merge import ASSIGN, TRISTATE, MergeResult, MergeSpec, merge_batch

OBSERVATION_SPEC = MergeSpec(
    key=["encounter", "observation_type", "observation_datetime"],
    fields={
        "value_as_real": ASSIGN,
        "value_as_text": ASSIGN,
        "value_as_date": ASSIGN,
        "unit": TRISTATE,
        "comment": TRISTATE,
    },
    event_time="valid_from",
    seq="seq",
)


def flowsheet_updates(msgs: DataFrame) -> DataFrame:
    """FLOWSHEET_SCHEMA messages -> visit_observation update rows with
    typed value dispatch (Flowsheet.java:26-89 value union)."""
    return msgs.select(
        F.col("visit_number").alias("encounter"),
        F.col("interface_id").alias("observation_type"),
        "observation_datetime",
        "valid_from",
        F.col("source_message_id").alias("seq"),
        F.when(F.col("value_type") == "NUMERIC", F.col("numeric_value")["value"]).alias(
            "value_as_real"
        ),
        F.when(F.col("value_type") == "TEXT", F.col("string_value")["value"]).alias(
            "value_as_text"
        ),
        F.when(F.col("value_type") == "DATE", F.to_date(F.col("date_value")["value"])).alias(
            "value_as_date"
        ),
        F.col("unit"),
        F.col("comment"),
    )


def process_flowsheets(
    current: DataFrame | None, msgs: DataFrame, stored_from: str
) -> MergeResult:
    return merge_batch(current, flowsheet_updates(msgs), OBSERVATION_SPEC, stored_from)


CONDITION_SPEC = MergeSpec(
    key=["mrn", "condition_type", "internal_id"],
    fields={
        "status": TRISTATE,
        "onset_date": ASSIGN,
        "resolution_date": ASSIGN,
        "comment": TRISTATE,
    },
    event_time="valid_from",
    seq="seq",
    tombstone="is_delete",
)

CONSULT_SPEC = MergeSpec(
    key=["internal_id"],
    fields={
        "encounter": ASSIGN,
        "consult_type": ASSIGN,
        "scheduled_datetime": ASSIGN,
        "cancelled": ASSIGN,
        "closed_on_discharge": ASSIGN,
        "comments": TRISTATE,
    },
    event_time="valid_from",
    seq="seq",
)


def process_conditions(
    current: DataFrame | None, updates: DataFrame, stored_from: str
) -> MergeResult:
    """D12 patient conditions (PatientConditionController.java:95-476):
    updates must carry the CONDITION_SPEC columns + is_delete for the
    hoover delete-all-then-readd pattern."""
    return merge_batch(current, updates, CONDITION_SPEC, stored_from)


def process_consults(
    current: DataFrame | None, updates: DataFrame, stored_from: str
) -> MergeResult:
    """D13/D14 consult + advance-decision shape
    (ConsultationRequestController.java:72-224)."""
    return merge_batch(current, updates, CONSULT_SPEC, stored_from)


FORM_SPEC = MergeSpec(
    key=["form_id"],
    fields={
        "form_name": ASSIGN,
        "encounter": ASSIGN,
        "mrn": ASSIGN,
        "last_filed": ASSIGN,
    },
    event_time="valid_from",
    seq="seq",
    tombstone="is_delete",
)

ANSWER_SPEC = MergeSpec(
    key=["form_id", "question"],
    fields={"answer": TRISTATE},
    event_time="valid_from",
    seq="seq",
)


def process_forms(
    form_current: DataFrame | None,
    answer_current: DataFrame | None,
    msgs: DataFrame,
    stored_from: str,
) -> tuple[MergeResult, MergeResult]:
    """D15/D16 (FormController.java:75-229, QuestionController.java:
    91-145): Form upsert by form instance id (delete-for-visit via
    tombstone) + FormAnswer upsert per (form, question) with tri-state
    answers. msgs carry an `answers` map<question,answer> that explodes
    into the RequestAnswer-shaped child rows."""
    forms = msgs.select(
        "form_id", "valid_from", "seq", "form_name", "encounter", "mrn",
        F.col("valid_from").alias("last_filed"), "is_delete",
    )
    answers = msgs.select(
        "form_id", "valid_from", "seq", F.explode_outer("answers").alias("question", "raw")
    ).filter(F.col("question").isNotNull()).select(
        "form_id",
        "question",
        "valid_from",
        "seq",
        F.struct(
            F.col("raw").alias("value"),
            F.when(F.col("raw") == '""', "DELETE").otherwise("SAVE").alias("status"),
        ).alias("answer"),
    )
    return (
        merge_batch(form_current, forms, FORM_SPEC, stored_from),
        merge_batch(answer_current, answers, ANSWER_SPEC, stored_from),
    )
