"""EmapEngine — the assembled pipeline (SURVEY.md §3.1 Spark shape).

A user of the reference feeds interchange messages and reads star
tables; this class is that surface on Spark:

    engine = EmapEngine()
    engine.process_batch(adt_df, batch_id=0)       # or attach to a stream
    engine.table("hospital_visit")                  # current snapshot
    engine.table_asof("hospital_visit", t)          # Q5 time travel
    engine.location_visits()                        # D6-inferred intervals
    engine.occupancy(t)                             # Q7 who-is-where

Tables are maintained in dependency order person -> visit (the
reference's AdtProcessor.processMessage orchestration,
core/.../AdtProcessor.java:67-85); location-visit intervals are
recomputed from accumulated movement history (D6 design, SURVEY §7
step 4) rather than merged incrementally.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.lineage import cut
from emap_spark.operators.locations import infer_location_visits, occupancy
from emap_spark.operators.merge import ASSIGN, FILL_IF_NULL, TRISTATE, MergeSpec, as_of
from emap_spark.streaming.pipeline import MergePipeline

ARRIVAL_OR_MOVE = (
    "ADMIT",
    "TRANSFER",
    "DISCHARGE",
    "REGISTER",
    "CANCEL_ADMIT",
    "CANCEL_TRANSFER",
    "CANCEL_DISCHARGE",
)


def _route_mrn(batch: DataFrame) -> DataFrame:
    """D1: every identified message upserts the Mrn row."""
    return batch.filter(F.col("mrn").isNotNull()).select(
        "mrn",
        F.col("valid_from"),
        F.col("source_message_id").alias("seq"),
        F.col("nhs_number"),
        F.col("source_system"),
    )


def _route_demographic(batch: DataFrame) -> DataFrame:
    """D4: demographics ride on any ADT message carrying them."""
    return batch.filter(F.col("mrn").isNotNull()).select(
        "mrn",
        "valid_from",
        F.col("source_message_id").alias("seq"),
        "name_given",
        "name_family",
        "sex",
        "birth_datetime",
        "death_datetime",
    )


def _route_visit(batch: DataFrame) -> DataFrame:
    """D5: visit lifecycle. UPDATE_PATIENT_INFO never creates a visit
    (VisitController.java:124-186) — drop it from the create path; admit
    sets admission, discharge sets discharge + backfills admission."""
    b = batch.filter(
        F.col("visit_number").isNotNull()
        & (F.col("message_type") != "UPDATE_PATIENT_INFO")
    )
    return b.select(
        F.col("visit_number").alias("encounter"),
        "valid_from",
        F.col("source_message_id").alias("seq"),
        F.col("mrn"),
        F.col("patient_class"),
        F.when(F.col("message_type") == "REGISTER", F.col("valid_from")).alias(
            "presentation_datetime"
        ),
        F.when(F.col("message_type") == "ADMIT", F.col("valid_from"))
        .when(
            (F.col("message_type") == "DISCHARGE")
            & (F.col("admission_datetime")["status"] == "SAVE"),
            F.col("admission_datetime")["value"],
        )
        .alias("admission_datetime"),
        F.when(F.col("message_type") == "DISCHARGE", F.col("valid_from")).alias(
            "discharge_datetime"
        ),
        F.col("discharge_disposition"),
        F.col("discharge_destination"),
    )


MRN_SPEC = MergeSpec(
    key=["mrn"],
    fields={"nhs_number": FILL_IF_NULL, "source_system": ASSIGN},
    event_time="valid_from",
    seq="seq",
)
DEMOGRAPHIC_SPEC = MergeSpec(
    key=["mrn"],
    fields={
        "name_given": TRISTATE,
        "name_family": TRISTATE,
        "sex": TRISTATE,
        "birth_datetime": TRISTATE,
        "death_datetime": TRISTATE,
    },
    event_time="valid_from",
    seq="seq",
)
VISIT_SPEC = MergeSpec(
    key=["encounter"],
    fields={
        "mrn": ASSIGN,
        "patient_class": TRISTATE,
        "presentation_datetime": FILL_IF_NULL,
        "admission_datetime": FILL_IF_NULL,
        "discharge_datetime": FILL_IF_NULL,
        "discharge_disposition": TRISTATE,
        "discharge_destination": TRISTATE,
    },
    event_time="valid_from",
    seq="seq",
)


class EmapEngine:
    def __init__(self, granularity: str = "message", storage_root: str | None = None) -> None:
        # message granularity = the reference's per-change audit trail
        # (as_of works at any t); "batch" trades that for fewer rows
        self.storage_root = storage_root
        self.pipeline = MergePipeline(
            {
                "mrn": (MRN_SPEC, _route_mrn),
                "core_demographic": (DEMOGRAPHIC_SPEC, _route_demographic),
                "hospital_visit": (VISIT_SPEC, _route_visit),
            },
            granularity=granularity,
            validator=F.col("mrn").isNotNull() | F.col("visit_number").isNotNull(),
            storage_root=os.path.join(storage_root, "pipeline") if storage_root else None,
        )
        # movement/merge history is an append-only event LOG, not merged
        # state: per batch we append one deduped part (durable mode: one
        # parquet dir per batch id, idempotent on replay) and defer the
        # cross-batch dedupe to read time. The previous design re-unioned
        # and re-deduplicated the whole history every batch — O(n²) over a
        # stream's life and driver-pinned; a log is O(batch) per batch.
        self._movement_parts: list[DataFrame] = []
        self._merge_parts: list[DataFrame] = []
        self._spark: SparkSession | None = None

    # -- ingestion ---------------------------------------------------------
    def load(self, spark: SparkSession) -> None:
        """Restart path: reattach to durable state (no-op in memory mode)."""
        self._spark = spark
        self.pipeline.load(spark)

    def process_batch(self, adt_batch: DataFrame, batch_id: int = 0) -> None:
        self._spark = adt_batch.sparkSession
        if self.storage_root is not None:
            self.pipeline.load(self._spark)
            if batch_id in self.pipeline.applied_batches:
                return  # restart replayed a committed batch
        moves = adt_batch.filter(F.col("message_type").isin(*ARRIVAL_OR_MOVE))
        cols = [
            "source_message_id",
            "message_type",
            "visit_number",
            "valid_from",
            "location",
            "previous_location",
        ]
        moves = moves.select(*cols).dropDuplicates(["source_message_id"])
        merges = (
            adt_batch.filter(
                (F.col("message_type") == "MERGE") & F.col("retired_mrn").isNotNull()
            )
            .select("retired_mrn", "mrn", "source_message_id")
            .dropDuplicates(["source_message_id"])
        )
        if self.storage_root is not None:
            # history parts land BEFORE the pipeline commit marker so a
            # crash between the two replays (idempotently) rather than
            # skipping the history write
            moves.write.mode("overwrite").parquet(
                os.path.join(self.storage_root, f"movement_history/batch={batch_id}")
            )
            merges.write.mode("overwrite").parquet(
                os.path.join(self.storage_root, f"merge_history/batch={batch_id}")
            )
        else:
            self._movement_parts.append(cut(moves))
            self._merge_parts.append(cut(merges))
        self.pipeline.process_batch(adt_batch, batch_id)

    def _movement_history(self) -> DataFrame | None:
        if self.storage_root is not None:
            d = os.path.join(self.storage_root, "movement_history")
            if not os.path.isdir(d):
                return None
            return (
                self._spark.read.parquet(d)
                .drop("batch")
                .dropDuplicates(["source_message_id"])
            )
        if not self._movement_parts:
            return None
        out = self._movement_parts[0]
        for p in self._movement_parts[1:]:
            out = out.unionByName(p)
        return out.dropDuplicates(["source_message_id"])

    def _merge_history(self) -> DataFrame | None:
        if self.storage_root is not None:
            d = os.path.join(self.storage_root, "merge_history")
            if not os.path.isdir(d):
                return None
            parts = self._spark.read.parquet(d).drop("batch")
        elif self._merge_parts:
            parts = self._merge_parts[0]
            for p in self._merge_parts[1:]:
                parts = parts.unionByName(p)
        else:
            return None
        return parts.dropDuplicates(["source_message_id"]).drop("source_message_id")

    def run_stream(self, stream_df: DataFrame, checkpoint_dir: str, **kw):
        """Streaming mode: same per-batch function under foreachBatch."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start(**kw)
        )

    # -- read surface ------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        state = self.pipeline.tables[name]
        return state.current.filter(~F.col("is_deleted")).drop("is_deleted")

    def audit(self, name: str) -> DataFrame | None:
        return self.pipeline.tables[name].audit()

    def table_asof(self, name: str, t) -> DataFrame:
        state = self.pipeline.tables[name]
        return as_of(state.current, state.audit(), t)

    def mrn_to_live(self) -> DataFrame:
        """D2: MrnToLive mapping from accumulated MERGE (A40) messages;
        chains collapsed by pointer doubling (operators/identity.py)."""
        from emap_spark.operators.identity import mrn_to_live

        merges = self._merge_history()
        if merges is None:
            base = self.table("mrn").select("mrn")
            return base.select("mrn", F.col("mrn").alias("live_mrn"))
        return mrn_to_live(self.table("mrn").select("mrn"), merges)

    def location_visits(self) -> DataFrame:
        history = self._movement_history()
        if history is None:
            raise ValueError("no movement messages processed yet")
        return infer_location_visits(history)

    def occupancy(self, t) -> DataFrame:
        return occupancy(self.location_visits(), t)

    def metrics(self, spark) -> DataFrame:
        return self.pipeline.metrics_df(spark)
