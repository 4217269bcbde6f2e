"""D7: pending transfers (PendingAdtController.java:69-145,
PlannedMovementRepository.java:30-64).

A15 PENDING_TRANSFER creates a PlannedMovement; A26 CANCEL_PENDING
matches "the closest prior un-matched event by (type, visit, location,
time)". Order-invariant Spark shape: rank creates and cancels per
(visit, location, type) by event time and pair i-th cancel with i-th
create — equivalent to the reference's findFirst ordered query when
cancels follow their creates, and deterministic under any arrival
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

PENDING_TYPES = ("PENDING_TRANSFER",)
CANCEL_TYPES = ("CANCEL_PENDING_TRANSFER",)


def match_pending_movements(msgs: DataFrame) -> DataFrame:
    """msgs: (source_message_id, message_type, visit_number, valid_from,
    location{value,status}). Returns planned_movement rows:
    (visit_number, location_string, event_datetime, cancelled,
    cancelled_datetime)."""
    base = msgs.filter(F.col("message_type").isin(*PENDING_TYPES, *CANCEL_TYPES)).select(
        "visit_number",
        "message_type",
        "valid_from",
        "source_message_id",
        F.col("location")["value"].alias("loc"),
    )
    wk = W.partitionBy("visit_number", "loc").orderBy("valid_from", "source_message_id")
    creates = base.filter(F.col("message_type").isin(*PENDING_TYPES)).withColumn(
        "rk", F.row_number().over(wk)
    )
    cancels = base.filter(F.col("message_type").isin(*CANCEL_TYPES)).withColumn(
        "rk", F.row_number().over(wk)
    )
    matched = creates.alias("c").join(
        cancels.select(
            "visit_number", "loc", "rk", F.col("valid_from").alias("cancel_t")
        ).alias("x"),
        ["visit_number", "loc", "rk"],
        "left",
    )
    return matched.select(
        "visit_number",
        F.col("loc").alias("location_string"),
        F.col("valid_from").alias("event_datetime"),
        F.col("cancel_t").isNotNull().alias("cancelled"),
        F.col("cancel_t").alias("cancelled_datetime"),
    )
