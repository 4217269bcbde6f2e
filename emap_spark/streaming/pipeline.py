"""Streaming ingestion pipeline (SURVEY.md §3.1 Spark shape, K2/K3/P10):

readStream (file/kafka/rate source) -> parse/route -> foreachBatch:
  1. dedupe on source_message_id (W4 at-least-once delivery)
  2. quarantine malformed rows (K3 NACK/dead-letter analogue)
  3. apply the bitemporal merge per entity table in dependency order
     (person -> visit -> location -> domain), batch- or
     message-granularity
  4. persist current + audit durably, append metrics (P10
     IdsEffectLogging analogue)

The same functions run in batch mode (validation replay, §3.3) — batch
/ streaming symmetry is the design stance of SURVEY §7.

Durability (K2 — the reference persists every upsert to Postgres,
core/.../RowState.java:186-201, App.java:92-101): pass ``storage_root``
and every batch writes

    {root}/tables/{name}/current/batch=<id>/   latest snapshot (pruned)
    {root}/tables/{name}/audit/batch=<id>/     append-only audit log
    {root}/quarantine/batch=<id>/              dead-letter rows
    {root}/metrics.jsonl                       per-batch timings/counts
    {root}/_applied.json                       commit marker (atomic)

The commit marker is written last (os.replace = atomic); a batch whose
id is already recorded is skipped entirely, which together with
per-batch-id overwrite-on-write makes restart replay exactly-once: if
the driver dies mid-batch the marker still names the previous batch, the
replay overwrites the partial files, and state converges. On a real
cluster the same contract is a Delta/Iceberg MERGE + transaction log;
parquet-dirs + marker is the dependency-free local equivalent.

Batch metrics are collected with ``Observation`` on the single
materializing action per batch — NOT separate count() jobs (three extra
full passes per micro-batch do not survive at 100 TB).
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from emap_spark.lineage import cut
from emap_spark.operators.merge import MergeResult, MergeSpec, merge_batch, merge_batch_versions

# deterministic, monotonic stored_from: base + batch_id seconds (audit
# bitemporal queries need stored_from non-decreasing in batch order)
_STORED_BASE = datetime.datetime(2024, 6, 1)


def stored_from_for_batch(batch_id: int) -> str:
    return (_STORED_BASE + datetime.timedelta(seconds=batch_id)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


@dataclass
class TableState:
    """Handle to one entity table's current + audit frames.

    In-memory mode: lineage-checkpointed frames (tests / ad-hoc replay).
    Durable mode: frames are parquet reads; audit() scans the append-only
    audit log directory."""

    spec: MergeSpec
    current: DataFrame | None = None
    audit_parts: list[DataFrame] = field(default_factory=list)
    audit_path: str | None = None
    spark: SparkSession | None = None

    def audit(self) -> DataFrame | None:
        if self.audit_path is not None:
            if not os.path.isdir(self.audit_path):
                return None
            return self.spark.read.parquet(self.audit_path).drop("batch")
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
    storage_root: optional directory for durable state (see module doc);
    None keeps everything in lineage-checkpointed frames.
    """

    def __init__(
        self,
        tables: dict[str, tuple[MergeSpec, callable]],
        message_id: str = "source_message_id",
        granularity: str = "batch",
        validator=None,
        storage_root: str | None = None,
    ) -> None:
        self.tables = {
            name: TableState(spec=spec) for name, (spec, _) in tables.items()
        }
        self.routers = {name: router for name, (_, router) in tables.items()}
        self.message_id = message_id
        self.granularity = granularity
        self.validator = validator
        self.storage_root = storage_root
        self.quarantine: DataFrame | None = None
        self.metrics: list[BatchMetrics] = []
        self._applied: set[int] = set()
        self._latest: int | None = None
        self._loaded = storage_root is None

    # -- durable state -----------------------------------------------------
    @property
    def applied_batches(self) -> set[int]:
        return self._applied

    def _marker_path(self) -> str:
        return os.path.join(self.storage_root, "_applied.json")

    def load(self, spark: SparkSession) -> None:
        """Reload durable state written by a previous run (restart path).

        Idempotent; called automatically by process_batch. Restores every
        table's current snapshot + audit-log handle and the applied-batch
        set so replayed batches are skipped."""
        if self._loaded:
            return
        self._loaded = True
        for name, state in self.tables.items():
            state.spark = spark
            state.audit_path = os.path.join(self.storage_root, "tables", name, "audit")
        marker = self._marker_path()
        if not os.path.isfile(marker):
            return
        with open(marker) as fh:
            meta = json.load(fh)
        self._applied = set(meta["applied"])
        self._latest = meta["latest"]
        for name, state in self.tables.items():
            cur = os.path.join(
                self.storage_root, "tables", name, f"current/batch={self._latest}"
            )
            if os.path.isdir(cur):
                state.current = spark.read.parquet(cur)
        metrics_file = os.path.join(self.storage_root, "metrics.jsonl")
        if os.path.isfile(metrics_file):
            with open(metrics_file) as fh:
                self.metrics = [BatchMetrics(**json.loads(line)) for line in fh]

    def _commit(self, batch_id: int) -> None:
        """Atomically record batch completion, then prune superseded
        current snapshots (keep latest + previous for crash safety)."""
        prev = self._latest
        self._applied.add(batch_id)
        self._latest = batch_id
        tmp = self._marker_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"applied": sorted(self._applied), "latest": batch_id}, fh)
        os.replace(tmp, self._marker_path())
        for name in self.tables:
            cur_root = os.path.join(self.storage_root, "tables", name, "current")
            if not os.path.isdir(cur_root):
                continue
            for d in os.listdir(cur_root):
                bid = int(d.split("=", 1)[1])
                if bid not in (batch_id, prev):
                    shutil.rmtree(os.path.join(cur_root, d), ignore_errors=True)

    # -- ingestion ---------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.storage_root is not None:
            self.load(spark)
            if batch_id in self._applied:
                return  # exactly-once: restart replayed a committed batch
        t0 = time.perf_counter()

        # ONE materializing pass computes dedupe + validation + metrics
        # (Observation piggybacks on the checkpoint action; the reference's
        # per-message IdsEffectLogging becomes per-batch counters).
        obs_in, obs_out = Observation(), Observation()
        valid = self.validator if self.validator is not None else F.lit(True)
        staged = (
            batch_df.observe(obs_in, F.count(F.lit(1)).alias("n_input"))
            .withColumn("__valid", valid)
            .dropDuplicates([self.message_id])
            .observe(
                obs_out,
                F.coalesce(F.sum(F.col("__valid").cast("long")), F.lit(0)).alias(
                    "n_deduped"
                ),
                F.coalesce(
                    F.sum((~F.col("__valid")).cast("long")), F.lit(0)
                ).alias("n_quarantined"),
            )
        )
        staged = cut(staged)  # materializes -> observations fire; lineage cut
        n_input = int(obs_in.get["n_input"])
        n_deduped = int(obs_out.get["n_deduped"])
        n_quarantined = int(obs_out.get["n_quarantined"])
        deduped = staged.filter(F.col("__valid")).drop("__valid")
        if n_quarantined:
            bad = staged.filter(~F.col("__valid")).drop("__valid")
            if self.storage_root is not None:
                bad.write.mode("overwrite").parquet(
                    os.path.join(self.storage_root, f"quarantine/batch={batch_id}")
                )
            else:
                self.quarantine = (
                    bad if self.quarantine is None else self.quarantine.unionByName(bad)
                )

        merge = merge_batch if self.granularity == "batch" else merge_batch_versions
        stored = stored_from_for_batch(batch_id)
        for name, state in self.tables.items():
            updates = self.routers[name](deduped)
            res: MergeResult = merge(state.current, updates, state.spec, stored)
            if self.storage_root is not None:
                troot = os.path.join(self.storage_root, "tables", name)
                cur_path = os.path.join(troot, f"current/batch={batch_id}")
                res.current.write.mode("overwrite").parquet(cur_path)
                res.audit.write.mode("overwrite").parquet(
                    os.path.join(troot, f"audit/batch={batch_id}")
                )
                state.current = spark.read.parquet(cur_path)
            else:
                # cut lineage: state folds across batches and must not
                # grow a plan (or a localCheckpoint chain) per batch
                state.current = cut(res.current)
                state.audit_parts.append(cut(res.audit))

        m = BatchMetrics(
            batch_id, n_input, n_deduped, n_quarantined,
            round(time.perf_counter() - t0, 3),
        )
        self.metrics.append(m)
        if self.storage_root is not None:
            with open(os.path.join(self.storage_root, "metrics.jsonl"), "a") as fh:
                fh.write(json.dumps(vars(m)) + "\n")
            self._commit(batch_id)

    def quarantine_df(self, spark: SparkSession) -> DataFrame | None:
        if self.storage_root is not None:
            qdir = os.path.join(self.storage_root, "quarantine")
            if not os.path.isdir(qdir):
                return None
            return spark.read.parquet(qdir).drop("batch")
        return self.quarantine

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
