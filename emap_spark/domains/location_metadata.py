"""D17: location metadata SCD — Department/Room/Bed dimensions with
*State history chains (LocationController.java:92-545).

The reference hand-maintains contiguous state intervals per dimension
row (new state invalidates the previous IF contiguous; out-of-order
arrival means the next state invalidates the incoming one). That is
exactly what merge_batch_versions produces when fed state-change
messages keyed by the dimension's business key: the version chain IS
the *State table, ordered by event time regardless of arrival order.

  department        current -> Department;  versions -> DepartmentState
  room (dept, room) current -> Room;        versions -> RoomState
  bed (dept, room, bed)                     versions -> BedState
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from emap_spark.operators.merge import ASSIGN, MergeResult, MergeSpec, merge_batch_versions

DEPARTMENT_SPEC = MergeSpec(
    key=["department"],
    fields={"name": ASSIGN, "speciality": ASSIGN, "status": ASSIGN},
    event_time="valid_from",
    seq="seq",
)

BED_SPEC = MergeSpec(
    key=["department", "room", "bed"],
    fields={"status": ASSIGN, "is_bunk": ASSIGN, "facilities": ASSIGN},
    event_time="valid_from",
    seq="seq",
)


def process_department_metadata(
    current: DataFrame | None, msgs: DataFrame, stored_from: str
) -> MergeResult:
    """msgs: (department, name, speciality, status, valid_from, seq).
    result.current = the Department dimension; result.audit rows +
    current = the DepartmentState SCD chain (valid_from/valid_until)."""
    return merge_batch_versions(current, msgs, DEPARTMENT_SPEC, stored_from)


def process_bed_metadata(
    current: DataFrame | None, msgs: DataFrame, stored_from: str
) -> MergeResult:
    return merge_batch_versions(current, msgs, BED_SPEC, stored_from)


def state_history(result: MergeResult) -> DataFrame:
    """The *State table: all versions (closed intervals from audit +
    the open current interval), ordered per key."""
    meta = [c for c in result.current.columns if c.startswith("__")]
    cur = result.current.drop(*meta).withColumn(
        "valid_until", F.lit(None).cast("timestamp_ntz")
    )
    closed = result.audit.drop("stored_until")
    return closed.unionByName(cur).filter(~F.col("is_deleted")).drop("is_deleted")
