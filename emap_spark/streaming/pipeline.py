"""Streaming ingestion pipeline (SURVEY.md §3.1 Spark shape, K2/K3/P10):

readStream (file/kafka/rate source) -> parse/route -> foreachBatch:
  1. dedupe on source_message_id (W4 at-least-once delivery)
  2. quarantine malformed rows (K3 NACK/dead-letter analogue)
  3. apply the bitemporal merge per entity table in dependency order
     (person -> visit -> location -> domain), batch- or
     message-granularity
  4. append audit, overwrite current, append metrics (P10
     IdsEffectLogging analogue)

The same functions run in batch mode (validation replay, §3.3) — batch
/ streaming symmetry is the design stance of SURVEY §7.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.operators.merge import MergeResult, MergeSpec, merge_batch, merge_batch_versions


@dataclass
class TableState:
    """Driver-held handle to one entity table's current + audit frames.

    Locally these are in-memory/checkpointed frames; on a cluster the
    write() hooks are parquet/Delta table writes (idempotent MERGE)."""

    spec: MergeSpec
    current: DataFrame | None = None
    audit_parts: list[DataFrame] = field(default_factory=list)

    def audit(self) -> DataFrame | None:
        if not self.audit_parts:
            return None
        out = self.audit_parts[0]
        for a in self.audit_parts[1:]:
            out = out.unionByName(a)
        return out


@dataclass
class BatchMetrics:
    batch_id: int
    n_input: int
    n_deduped: int
    n_quarantined: int
    seconds: float


class MergePipeline:
    """foreachBatch-able pipeline over a set of entity tables.

    tables: name -> (MergeSpec, router) where router(batch_df) selects +
    projects this table's update rows from the incoming message batch.
    """

    def __init__(
        self,
        tables: dict[str, tuple[MergeSpec, callable]],
        message_id: str = "source_message_id",
        granularity: str = "batch",
        validator=None,
    ) -> None:
        self.tables = {
            name: TableState(spec=spec) for name, (spec, _) in tables.items()
        }
        self.routers = {name: router for name, (_, router) in tables.items()}
        self.message_id = message_id
        self.granularity = granularity
        self.validator = validator
        self.quarantine: DataFrame | None = None
        self.metrics: list[BatchMetrics] = []

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        n_input = batch_df.count()
        # W4: at-least-once -> idempotent via message-id dedupe
        deduped = batch_df.dropDuplicates([self.message_id])
        # K3: quarantine rows failing validation instead of failing the job
        if self.validator is not None:
            bad = deduped.filter(~self.validator)
            deduped = deduped.filter(self.validator)
            n_quarantined = bad.count()
            if n_quarantined:
                self.quarantine = (
                    bad if self.quarantine is None else self.quarantine.unionByName(bad)
                )
        else:
            n_quarantined = 0
        n_deduped = deduped.count()
        deduped = deduped.localCheckpoint(eager=True)

        merge = merge_batch if self.granularity == "batch" else merge_batch_versions
        stored = f"2024-06-01 00:00:{batch_id % 60:02d}"
        for name, state in self.tables.items():
            updates = self.routers[name](deduped)
            res: MergeResult = merge(state.current, updates, state.spec, stored)
            # cut lineage: streaming state must not grow a plan per batch
            state.current = res.current.localCheckpoint(eager=True)
            state.audit_parts.append(res.audit.localCheckpoint(eager=True))
        self.metrics.append(
            BatchMetrics(batch_id, n_input, n_deduped, n_quarantined, round(time.perf_counter() - t0, 3))
        )

    def run_stream(self, stream_df: DataFrame, checkpoint_dir: str, trigger_seconds: int = 10):
        """Attach to a streaming DataFrame; micro-batch cadence mirrors
        the reference's 10 s collation drain (W2)."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [
                (m.batch_id, m.n_input, m.n_deduped, m.n_quarantined, m.seconds)
                for m in self.metrics
            ],
            "batch_id long, n_input long, n_deduped long, n_quarantined long, seconds double",
        )


def retention_sweep(
    table: DataFrame,
    ts_col: str = "observation_datetime",
    retention_hours: int = 24 * 7,
) -> DataFrame:
    """K4/W7: retention delete baselined on max observed time, not wall
    clock (WaveformProcessor.java:58-96; WaveformRepository.java:39-43).
    Returns the retained frame; on a date-partitioned lakehouse table
    this compiles to partition drops."""
    cutoff = table.agg(
        (F.max(F.col(ts_col)) - F.expr(f"INTERVAL {retention_hours} HOURS")).alias("c")
    )
    return table.join(F.broadcast(cutoff)).filter(F.col(ts_col) >= F.col("c")).drop("c")


def process_prioritized(
    pipeline: MergePipeline,
    live: DataFrame,
    backfill: DataFrame | None,
    batch_id: int,
    backfill_budget_rows: int | None = None,
) -> None:
    """W5: live messages drain before backfill (the reference consumes
    queues in priority order, core App.java:68-75 'ordering of queue
    names ... matters'; hoover drains between live messages).

    Processes the live batch first, then at most backfill_budget_rows of
    backfill in the same cycle — the remainder waits for an idle cycle.
    Order-permutation invariance (W3) makes the interleaving safe: final
    state is independent of which cycle a backfill message lands in.
    """
    pipeline.process_batch(live, batch_id)
    if backfill is not None:
        if backfill_budget_rows is not None:
            backfill = backfill.limit(backfill_budget_rows)
        pipeline.process_batch(backfill, batch_id + 1_000_000)
