"""Metadata dimension feeds (SURVEY §1.1 message families:
FlowsheetMetadata, LabMetadataMsg, ConsultMetadata, FormMetadataMsg /
FormQuestionMetadataMsg) — the dimension-table side of the star schema.

Each feed upserts a small dimension keyed by its source code; renames
and recategorizations are SCD-tracked via merge_batch_versions exactly
like location metadata (D17):

  visit_observation_type  <- FlowsheetMetadata
      (VisitObservationTypeController.java: flowsheet rows keyed by
       interface id; name/display/unit update newer-wins)
  lab_test_definition     <- LabMetadataMsg
      (LabMetadataController: keyed (lab_provider, test_lab_code))
  consultation_type       <- ConsultMetadata
      (ConsultationRequestTypeController: code -> name)
  form / form_question    <- FormMetadataMsg, FormQuestionMetadataMsg
      (FormController.createOrUpdateFormMetadata :168-229)

All dimensions are broadcast-sized; their merges shuffle only the tiny
update batch, and downstream joins against them broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from emap_spark.operators.merge import (
    ASSIGN,
    FILL_IF_NULL,
    MergeResult,
    MergeSpec,
    merge_batch_versions,
)

OBSERVATION_TYPE_SPEC = MergeSpec(
    key=["interface_id"],
    fields={
        "name": ASSIGN,
        "display_name": ASSIGN,
        "value_type": ASSIGN,
        "unit": ASSIGN,
        "creation_datetime": FILL_IF_NULL,
    },
    event_time="valid_from",
    seq="seq",
)

LAB_TEST_SPEC = MergeSpec(
    key=["lab_provider", "test_lab_code"],
    fields={"name": ASSIGN, "lab_department": ASSIGN},
    event_time="valid_from",
    seq="seq",
)

CONSULT_TYPE_SPEC = MergeSpec(
    key=["code"],
    fields={"name": ASSIGN},
    event_time="valid_from",
    seq="seq",
)

FORM_METADATA_SPEC = MergeSpec(
    key=["form_source_id"],
    fields={"form_name": ASSIGN, "patient_friendly_name": ASSIGN},
    event_time="valid_from",
    seq="seq",
)

FORM_QUESTION_SPEC = MergeSpec(
    key=["question_source_id"],
    fields={"concept_name": ASSIGN, "concept_abbrev_name": ASSIGN},
    event_time="valid_from",
    seq="seq",
)

_SPECS = {
    "visit_observation_type": OBSERVATION_TYPE_SPEC,
    "lab_test_definition": LAB_TEST_SPEC,
    "consultation_type": CONSULT_TYPE_SPEC,
    "form_metadata": FORM_METADATA_SPEC,
    "form_question": FORM_QUESTION_SPEC,
}


def process_metadata(
    table: str,
    current: DataFrame | None,
    msgs: DataFrame,
    stored_from: str,
) -> MergeResult:
    """Apply one batch of metadata messages to the named dimension;
    result.audit + current = the SCD chain (rename history)."""
    return merge_batch_versions(current, msgs, _SPECS[table], stored_from)
