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

from emap_spark.operators.merge import (
    ASSIGN,
    FILL_IF_NULL,
    TRISTATE,
    MergeResult,
    MergeSpec,
    merge_batch,
)

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
        "severity": TRISTATE,
    },
    event_time="valid_from",
    seq="seq",
    tombstone="is_delete",
)

# D12 children. AllergenReaction is REPLACE-SET: each allergy message
# deletes every reaction recorded at-or-before its time and re-adds its
# own list (PatientConditionController.java:213-240) — i.e. the newest
# message's reaction array wins wholesale, which is exactly ASSIGN on
# the array; the read view explodes it.
REACTION_SPEC = MergeSpec(
    key=["mrn", "condition_type", "internal_id"],
    fields={"reactions": ASSIGN},
    event_time="valid_from",
    seq="seq",
    tombstone="is_delete",
)

# ConditionVisits link table (:346): a condition message carrying a
# visit adds an (condition, visit) edge; links accumulate (add-only),
# first_linked records the earliest linking message.
CONDITION_VISIT_SPEC = MergeSpec(
    key=["mrn", "condition_type", "internal_id", "encounter"],
    fields={"first_linked": FILL_IF_NULL},
    event_time="valid_from",
    seq="seq",
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
    current: dict[str, DataFrame | None],
    msgs: DataFrame,
    stored_from: str,
) -> dict[str, MergeResult]:
    """D12 patient conditions + children
    (PatientConditionController.java:95-476): CONDITION_SCHEMA messages
    -> patient_condition upsert (tombstone = the hoover
    delete-all-then-readd pattern), allergen_reaction replace-set, and
    condition_visits links. One pass over the batch; each merge
    shuffles on its own business key."""
    key = ["mrn", "condition_type", "internal_id"]
    base = msgs.select(
        *key,
        "valid_from",
        F.col("source_message_id").alias("seq"),
        "status",
        "onset_date",
        "resolution_date",
        "comment",
        "severity",
        "reactions",
        "visit_number",
        "is_delete",
    )
    conditions = base.drop("reactions", "visit_number")
    reactions = base.filter(
        (F.col("condition_type") == "PATIENT_ALLERGY") | F.col("is_delete")
    ).select(*key, "valid_from", "seq", "reactions", "is_delete")
    links = base.filter(F.col("visit_number").isNotNull() & ~F.col("is_delete")).select(
        *key,
        F.col("visit_number").alias("encounter"),
        "valid_from",
        "seq",
        F.col("valid_from").alias("first_linked"),
    )
    return {
        "patient_condition": merge_batch(
            current.get("patient_condition"), conditions, CONDITION_SPEC, stored_from
        ),
        "allergen_reaction": merge_batch(
            current.get("allergen_reaction"), reactions, REACTION_SPEC, stored_from
        ),
        "condition_visits": merge_batch(
            current.get("condition_visits"), links, CONDITION_VISIT_SPEC, stored_from
        ),
    }


def allergen_reactions_view(reaction_state: DataFrame) -> DataFrame:
    """Exploded read view: one row per (condition, reaction)."""
    return reaction_state.select(
        "mrn",
        "condition_type",
        "internal_id",
        F.explode("reactions").alias("reaction"),
    )


def process_consults(
    current: DataFrame | None, updates: DataFrame, stored_from: str
) -> MergeResult:
    """D13 consult requests (ConsultationRequestController.java:72-224)."""
    return merge_batch(current, updates, CONSULT_SPEC, stored_from)


# D16 for the consult path: the ConsultRequest questions map becomes the
# question / request_answer child pair (QuestionController.java:91-145;
# questions are a dimension keyed by text, answers upsert per
# (parent, question) with newer-wins tri-state).
CONSULT_QUESTION_SPEC = MergeSpec(
    key=["internal_id", "question"],
    fields={"answer": TRISTATE},
    event_time="valid_from",
    seq="seq",
)


def process_consult_questions(
    current: DataFrame | None, consults: DataFrame, stored_from: str
) -> MergeResult:
    """Explode each consult's questions map into request_answer rows and
    upsert per (consult, question). Works over any frame carrying
    internal_id/valid_from/seq + a questions map — the interchange
    generator path (q84) and the raw-HL7 factory path (q101) both feed
    it."""
    qa = (
        consults.select(
            "internal_id",
            "valid_from",
            "seq",
            F.explode_outer("questions").alias("question", "raw"),
        )
        .filter(F.col("question").isNotNull())
        .select(
            "internal_id",
            "question",
            "valid_from",
            "seq",
            F.struct(
                F.col("raw").alias("value"),
                F.when(F.col("raw") == '""', "DELETE").otherwise("SAVE").alias("status"),
            ).alias("answer"),
        )
    )
    return merge_batch(current, qa, CONSULT_QUESTION_SPEC, stored_from)


# D14: advance decisions get their own table + fields
# (informdb/decisions/AdvanceDecision.java:28-86:
# advanceDecisionType, closedDueToDischarge, statusChangeDatetime,
# requestedDatetime (first recorded -> fill), cancelled)
ADVANCE_DECISION_SPEC = MergeSpec(
    key=["internal_id"],
    fields={
        "advance_decision_type": ASSIGN,
        "encounter": ASSIGN,
        "mrn": ASSIGN,
        "cancelled": ASSIGN,
        "closed_due_to_discharge": ASSIGN,
        "status_change_datetime": ASSIGN,
        "requested_datetime": FILL_IF_NULL,
    },
    event_time="valid_from",
    seq="seq",
)


def process_advance_decisions(
    current: DataFrame | None, updates: DataFrame, stored_from: str
) -> MergeResult:
    """D14 (AdvanceDecisionController): upsert by EPIC internal id;
    cancellation and discharge-closure are plain newer-wins booleans,
    requestedDatetime keeps the first recorded value."""
    return merge_batch(current, updates, ADVANCE_DECISION_SPEC, stored_from)


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
