"""Minimal transaction-logged multi-version table store — the
incremental MERGE contract for the K2 sink (SURVEY §2.1; the reference
commits one transaction per message, core/.../RowState.java:186-201;
SURVEY maps that to "idempotent MERGE (Delta)" on Spark).

Why not a per-batch full snapshot rewrite: at 100 TB a table rewrite per
micro-batch is O(table x batches) write amplification. The MERGE
contract here is what Delta/Iceberg implement — this is the
dependency-free local equivalent with the same interface shape:

  tables/{name}/delta/batch={id}/   row VERSIONS for keys touched by the
                                    batch (current rows tagged __rk=1,
                                    superseded/audit rows __rk>1), each
                                    carrying __v = batch id
  tables/{name}/base/v={id}/        compacted fold of older deltas
  tables/{name}/_manifest.json      the transaction log: which files are
                                    live, which batches are committed

Contract:
  * commit(batch_id, combined)  — O(touched keys) write, never O(table).
    The manifest update is an atomic rename; a batch id already in the
    manifest is a no-op (exactly-once under crash/replay: the caller
    skips the merge entirely when has_batch(id) is true, so a crash
    after the manifest rename but before the pipeline marker cannot
    re-merge against state that already absorbed the batch).
  * read_current()              — latest committed version per key:
    union(live files) -> window max(__v) per key, __rk == 1.  In
    "replace_set" mode the whole row-set of the latest __v per set key
    wins (D6 interval tables, where a new message for a visit replaces
    ALL of that visit's interval rows, including removals).
  * read_audit()                — append-only union of __rk>1 rows.
  * compaction every `compact_every` commits folds live files into one
    base so the read plan stays O(base + compact_every x batch).

At cluster scale the same layout maps 1:1 onto Delta Lake (delta dirs =
AddFiles, manifest = _delta_log, compaction = OPTIMIZE); swapping the
backend is a constructor change, which is the point of the interface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

META_RK = "__rk"
META_V = "__v"


class DeltaLog:
    """One logical table backed by delta files + a JSON transaction log."""

    def __init__(
        self,
        root: str,
        name: str,
        key: list[str],
        compact_every: int = 8,
        replace_set: bool = False,
    ) -> None:
        self.root = os.path.join(root, "tables", name)
        self.name = name
        self.key = key
        self.compact_every = compact_every
        self.replace_set = replace_set
        self.spark: SparkSession | None = None
        self._manifest: dict | None = None

    # -- transaction log ---------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def load(self, spark: SparkSession) -> None:
        self.spark = spark
        if self._manifest is not None:
            return
        p = self._manifest_path()
        if os.path.isfile(p):
            with open(p) as fh:
                self._manifest = json.load(fh)
        else:
            self._manifest = {"base": None, "deltas": [], "n_commits": 0}

    def _write_manifest(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._manifest, fh)
        os.replace(tmp, self._manifest_path())

    def has_batch(self, batch_id: int) -> bool:
        return batch_id in self._manifest["deltas"] or (
            self._manifest["base"] is not None
            and batch_id <= self._manifest["base"]
            and batch_id in self._manifest.get("compacted", [])
        )

    # -- paths -------------------------------------------------------------
    def _delta_path(self, batch_id: int) -> str:
        return os.path.join(self.root, f"delta/batch={batch_id}")

    def _base_path(self, v: int) -> str:
        return os.path.join(self.root, f"base/v={v}")

    def _live_paths(self) -> list[str]:
        paths = []
        if self._manifest["base"] is not None:
            paths.append(self._base_path(self._manifest["base"]))
        paths.extend(self._delta_path(b) for b in self._manifest["deltas"])
        return paths

    # -- reads -------------------------------------------------------------
    def _read_live(self) -> DataFrame | None:
        paths = self._live_paths()
        if not paths:
            return None
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def read_current(self, keys: DataFrame | None = None) -> DataFrame | None:
        """Latest committed version per key (tombstones included — the
        merge engine needs them; readers filter).

        keys: optional frame of key values to restrict to. The restrict
        happens BELOW the latest-per-key window (a key-filtered set has
        the same per-key latest rows), so an incremental merge shuffles
        only the touched keys' rows — windows block join pushdown in
        Catalyst, so filtering after read_current() would shuffle the
        WHOLE table every batch."""
        live = self._read_live()
        if live is None:
            return None
        if keys is not None:
            live = live.join(F.broadcast(keys), self.key, "left_semi")
        if self.replace_set:
            # newest batch that touched the set key owns its whole row-set.
            # __rk=0 marker rows advance the set's version WITHOUT adding
            # content — they are how a batch replaces a set with the EMPTY
            # set (e.g. a cancel voiding every interval of a visit).
            wmax = W.partitionBy(*self.key)
            return (
                live.withColumn("__vmax", F.max(META_V).over(wmax))
                .filter((F.col(META_V) == F.col("__vmax")) & (F.col(META_RK) == 1))
                .drop("__vmax", META_V, META_RK, "valid_until", "stored_until")
            )
        w = W.partitionBy(*self.key).orderBy(F.col(META_V).desc())
        return (
            live.filter(F.col(META_RK) == 1)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", META_V, META_RK, "valid_until", "stored_until")
        )

    def read_audit(self) -> DataFrame | None:
        live = self._read_live()
        if live is None:
            return None
        aud = live.filter(F.col(META_RK) > 1).drop(META_V, META_RK)
        # per-field last-write markers / provenance flags are
        # current-frame merge metadata, not part of the audit surface
        return aud.drop(*[c for c in aud.columns if c.startswith("__")])

    # -- writes ------------------------------------------------------------
    def commit(self, batch_id: int, combined: DataFrame) -> int:
        """Write the batch's row versions and commit them to the log;
        returns the number of Spark actions spent (1, +1 when this
        commit triggered a compaction).

        ``combined`` must carry __rk (1 = new current version for its
        key, >1 = superseded/audit version) plus valid_until /
        stored_until columns (null on current rows). Write cost is
        O(rows in combined) = O(keys touched by the batch)."""
        if self.has_batch(batch_id):
            return 0
        path = self._delta_path(batch_id)
        combined.withColumn(META_V, F.lit(batch_id).cast("long")).write.mode(
            "overwrite"
        ).parquet(path)
        self._manifest["deltas"].append(batch_id)
        self._manifest["n_commits"] += 1
        self._write_manifest()
        if len(self._manifest["deltas"]) >= self.compact_every:
            self._compact()
            return 2
        return 1

    def _compact(self) -> None:
        """Fold live files into one base (current + all audit rows) so
        the read plan stays bounded. Old files are removed only after
        the manifest rename — readers never see a partial state."""
        v = max(self._manifest["deltas"])
        cur = self.read_current().select(
            "*",
            F.lit(None).cast("timestamp_ntz").alias("valid_until"),
            F.lit(None).cast("timestamp_ntz").alias("stored_until"),
            F.lit(1).alias(META_RK),
        )
        aud = self.read_audit().withColumn(META_RK, F.lit(2))
        old_paths = self._live_paths()
        folded = cur.unionByName(aud, allowMissingColumns=True).withColumn(
            META_V, F.lit(v).cast("long")
        )
        folded.write.mode("overwrite").parquet(self._base_path(v))
        compacted = sorted(
            set(self._manifest.get("compacted", [])) | set(self._manifest["deltas"])
        )
        self._manifest = {
            "base": v,
            "deltas": [],
            "n_commits": self._manifest["n_commits"],
            "compacted": compacted,
        }
        self._write_manifest()
        for p in old_paths:
            if p != self._base_path(v):
                shutil.rmtree(p, ignore_errors=True)


class SnapshotStore:
    """The round-2 backend, kept behind the same interface: full current
    snapshot per batch + append-only audit dirs. Correct and
    restart-safe, but O(table) write per batch — superseded by DeltaLog
    for the scale path; retained so the durability tests can assert both
    backends agree."""

    def __init__(self, root: str, name: str, key: list[str]) -> None:
        self.root = os.path.join(root, "tables", name)
        self.name = name
        self.key = key
        self.spark: SparkSession | None = None
        self._manifest: dict | None = None

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def load(self, spark: SparkSession) -> None:
        self.spark = spark
        if self._manifest is not None:
            return
        p = self._manifest_path()
        if os.path.isfile(p):
            with open(p) as fh:
                self._manifest = json.load(fh)
        else:
            self._manifest = {"latest": None, "applied": []}

    def has_batch(self, batch_id: int) -> bool:
        return batch_id in self._manifest["applied"]

    def read_current(self) -> DataFrame | None:
        if self._manifest["latest"] is None:
            return None
        return self.spark.read.parquet(
            os.path.join(self.root, f"current/batch={self._manifest['latest']}")
        )

    def read_audit(self) -> DataFrame | None:
        audit_root = os.path.join(self.root, "audit")
        if not os.path.isdir(audit_root):
            return None
        return self.spark.read.parquet(audit_root).drop("batch")

    def commit(self, batch_id: int, combined: DataFrame) -> int:
        if self.has_batch(batch_id):
            return 0
        from emap_spark.operators.merge import split_combined

        prev = self._manifest["latest"]
        # one fold materialization (stage), then two cheap file-to-file
        # splits — this backend's O(table) cost is the SNAPSHOT rewrite,
        # not a double fold
        stage = os.path.join(self.root, f"stage/batch={batch_id}")
        combined.write.mode("overwrite").parquet(stage)
        cur, aud = split_combined(self.spark.read.parquet(stage))
        cur_path = os.path.join(self.root, f"current/batch={batch_id}")
        cur.write.mode("overwrite").parquet(cur_path)
        aud.write.mode("overwrite").parquet(
            os.path.join(self.root, f"audit/batch={batch_id}")
        )
        self._manifest["applied"].append(batch_id)
        self._manifest["latest"] = batch_id
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._manifest, fh)
        os.replace(tmp, self._manifest_path())
        cur_root = os.path.join(self.root, "current")
        for d in os.listdir(cur_root):
            bid = int(d.split("=", 1)[1])
            if bid not in (batch_id, prev):
                shutil.rmtree(os.path.join(cur_root, d), ignore_errors=True)
        shutil.rmtree(os.path.join(self.root, "stage"), ignore_errors=True)
        return 3
