"""D9-D11: labs domain — nested LabOrderMsg processing
(core/.../LabController.java:72-95, LabOrderController.java:78-190,
LabResultController.java:112-213).

One LabOrderMsg carries the sample, the order, and a nested list of
results (lab/LabOrderMsg.java:29-67). Spark shape: explode the message
once into three update frames, then reuse the generic merge engine per
table:

  lab_sample  key=external_lab_number                  (upsert by sample)
  lab_order   key=(external_lab_number, battery_code)  (delete-sentinel
              epic_order_number '\"\"' -> tombstone, the reference's
              delete-order path LabOrderController.java:150-190)
  lab_result  key=(external_lab_number, battery_code, test_code)
              (mime dispatch NUMERIC/TEXT/PDF/LAB_ISOLATE ->
              value_as_real/text/bytes; result_last_modified tracks the
              contributing message time, LabResultController.java:112-143)

All three merges shuffle on their own business key; the explode is
map-side (no shuffle).
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

SAMPLE_SPEC = MergeSpec(
    key=["external_lab_number"],
    fields={
        "mrn": ASSIGN,
        "collection_datetime": FILL_IF_NULL,
        "sample_received": FILL_IF_NULL,
    },
    event_time="valid_from",
    seq="seq",
)

ORDER_SPEC = MergeSpec(
    key=["external_lab_number", "battery_code"],
    fields={
        "encounter": FILL_IF_NULL,
        "epic_order_number": TRISTATE,
        "order_datetime": FILL_IF_NULL,
        "source_system": ASSIGN,
    },
    event_time="valid_from",
    seq="seq",
    tombstone="is_delete",
)

# D11: micro child tables. Isolates key on isolate_id because code and
# name can change (LabIsolateMsg.java:20-24); sensitivities key on the
# antimicrobial agent under their isolate
# (LabResultController.java:153-213). reporting_datetime is exposed in
# the read view as the row's valid_from — the time of the last applied
# sensitivity change — rather than merged as a field (the reference
# bumps reportingDatetime only when the sensitivity value changes).
ISOLATE_SPEC = MergeSpec(
    key=["external_lab_number", "battery_code", "test_code", "isolate_id"],
    fields={
        "isolate_code": ASSIGN,
        "isolate_name": ASSIGN,
        "culture_type": TRISTATE,
        "quantity": TRISTATE,
        "clinical_information": TRISTATE,
    },
    event_time="valid_from",
    seq="seq",
)

SENSITIVITY_SPEC = MergeSpec(
    key=["external_lab_number", "battery_code", "test_code", "isolate_id", "agent"],
    fields={"sensitivity": ASSIGN},
    event_time="valid_from",
    seq="seq",
)

RESULT_SPEC = MergeSpec(
    key=["external_lab_number", "battery_code", "test_code"],
    fields={
        "value_type": ASSIGN,
        "value_as_real": ASSIGN,
        "result_operator": ASSIGN,
        "value_as_text": ASSIGN,
        "value_as_bytes": ASSIGN,
        "units": ASSIGN,
        "range_low": ASSIGN,
        "range_high": ASSIGN,
        "abnormal_flag": ASSIGN,
        "result_last_modified": ASSIGN,
    },
    event_time="result_time",
    seq="seq",
)


def split_lab_messages(msgs: DataFrame) -> dict[str, DataFrame]:
    """One pass over LAB_ORDER_SCHEMA messages -> per-table update frames."""
    base = msgs.select(
        F.col("source_message_id").alias("seq"),
        "valid_from",
        "mrn",
        "visit_number",
        "external_lab_number",
        "battery_code",
        "epic_order_number",
        "order_datetime",
        "sample_received",
        "collection_datetime",
        "source_system",
        "results",
    )
    samples = base.select(
        "external_lab_number",
        "valid_from",
        "seq",
        "mrn",
        "collection_datetime",
        F.col("sample_received")["value"].alias("sample_received"),
    )
    orders = base.select(
        "external_lab_number",
        "battery_code",
        "valid_from",
        "seq",
        F.col("visit_number").alias("encounter"),
        F.col("epic_order_number").alias("epic_order_number"),
        F.col("order_datetime")["value"].alias("order_datetime"),
        "source_system",
        # the reference's delete-order sentinel: epicOrderNumber DELETE
        (F.col("epic_order_number")["status"] == "DELETE").alias("is_delete"),
    )
    r = base.select(
        "external_lab_number",
        "battery_code",
        "valid_from",
        "seq",
        F.explode_outer("results").alias("res"),
    ).filter(F.col("res").isNotNull())
    results = r.select(
        "external_lab_number",
        "battery_code",
        F.col("res")["test_code"].alias("test_code"),
        F.coalesce(F.col("res")["result_time"], F.col("valid_from")).alias("result_time"),
        "seq",
        F.col("res")["value_type"].alias("value_type"),
        # mime dispatch: NUMERIC -> real, TEXT -> text, PDF -> bytes
        F.when(F.col("res")["value_type"] == "NUMERIC", F.col("res")["numeric_value"]).alias(
            "value_as_real"
        ),
        F.col("res")["result_operator"].alias("result_operator"),
        F.when(
            F.col("res")["value_type"].isin("TEXT", "LAB_ISOLATE"), F.col("res")["string_value"]
        ).alias("value_as_text"),
        F.when(F.col("res")["value_type"] == "PDF", F.col("res")["bytes_value"]).alias(
            "value_as_bytes"
        ),
        F.col("res")["units"].alias("units"),
        F.col("res")["range_low"].alias("range_low"),
        F.col("res")["range_high"].alias("range_high"),
        F.col("res")["abnormal_flag"].alias("abnormal_flag"),
        F.coalesce(F.col("res")["result_time"], F.col("valid_from")).alias(
            "result_last_modified"
        ),
    )
    iso = r.filter(F.col("res")["isolate"].isNotNull()).select(
        "external_lab_number",
        "battery_code",
        F.col("res")["test_code"].alias("test_code"),
        "valid_from",
        "seq",
        F.col("res")["isolate"].alias("iso"),
    )
    isolates = iso.select(
        "external_lab_number",
        "battery_code",
        "test_code",
        F.col("iso")["isolate_id"].alias("isolate_id"),
        "valid_from",
        "seq",
        F.col("iso")["isolate_code"].alias("isolate_code"),
        F.col("iso")["isolate_name"].alias("isolate_name"),
        F.col("iso")["culture_type"].alias("culture_type"),
        F.col("iso")["quantity"].alias("quantity"),
        F.col("iso")["clinical_information"].alias("clinical_information"),
    )
    sensitivities = (
        iso.select(
            "external_lab_number",
            "battery_code",
            "test_code",
            F.col("iso")["isolate_id"].alias("isolate_id"),
            "valid_from",
            "seq",
            F.explode(F.col("iso")["sensitivities"]).alias("sens"),
        )
        # a sensitivity with no agent is unknown -> skipped
        # (LabResultController.updateOrCreateSensitivity:190-193)
        .filter(F.col("sens")["agent"].isNotNull())
        .select(
            "external_lab_number",
            "battery_code",
            "test_code",
            "isolate_id",
            F.col("sens")["agent"].alias("agent"),
            F.coalesce(F.col("sens")["result_time"], F.col("valid_from")).alias(
                "valid_from"
            ),
            "seq",
            F.col("sens")["sensitivity"].alias("sensitivity"),
        )
    )
    return {
        "lab_sample": samples,
        "lab_order": orders,
        "lab_result": results,
        "lab_isolate": isolates,
        "lab_sensitivity": sensitivities,
    }


def process_lab_orders(
    current: dict[str, DataFrame | None],
    msgs: DataFrame,
    stored_from: str,
) -> dict[str, MergeResult]:
    """Apply one batch of lab-order messages to the five lab tables."""
    updates = split_lab_messages(msgs)
    specs = {
        "lab_sample": SAMPLE_SPEC,
        "lab_order": ORDER_SPEC,
        "lab_result": RESULT_SPEC,
        "lab_isolate": ISOLATE_SPEC,
        "lab_sensitivity": SENSITIVITY_SPEC,
    }
    return {
        name: merge_batch(current.get(name), updates[name], specs[name], stored_from)
        for name in specs
    }
