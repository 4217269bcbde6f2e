"""D19 durable waveform log with SCHEDULED ORPHAN REPAIR.

The reference attaches a waveform stream to a visit by bed location at
ingest time and leaves the visit NULL FOREVER when no visit is known yet
(WaveformController.java:60-66; waveform_hf_data.md:96-126 discusses the
limitation). Here orphans are first-class repairable state: the log is
partitioned by attachment status, so a periodic repair pass scans ONLY
the orphan files, re-joins them against the (possibly newer)
location_visit intervals, and overlays the newly attached rows — late
ADT no longer strands high-frequency data.

Layout (one parquet log):
  waveform/batch={id}/att={0|1}/   collated rows from one ingest batch,
                                   partitioned by attachment status
  repair/rep={id}/                 repaired rows (orphans that found
                                   their visit in repair pass {id})
  _manifest.json                   committed batches / repair passes +
                                   the ingest counter driving the
                                   schedule

Scale shape: the repair join is O(orphan rows x touched intervals) —
orphan files are enumerated from the manifest (att=0 partitions only),
never the attached bulk; repairs append, nothing rewrites. Reads
resolve identity (source_location, source_stream_id,
observation_datetime): repaired rows shadow their orphan originals via
a left-anti join on that key.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.operators.locations import repair_orphan_waveforms

_ID = ["source_location", "source_stream_id", "observation_datetime"]


class WaveformStore:
    def __init__(self, root: str, repair_every: int = 4) -> None:
        self.root = os.path.join(root, "waveform_log")
        self.repair_every = repair_every
        self.spark: SparkSession | None = None
        self._manifest: dict | None = None

    # -- manifest ----------------------------------------------------------
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
            self._manifest = {"batches": [], "repairs": [], "n_ingests": 0}

    def _write_manifest(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._manifest, fh)
        os.replace(tmp, self._manifest_path())

    # -- writes ------------------------------------------------------------
    def ingest(
        self,
        collated: DataFrame,
        batch_id: int,
        location_visits: DataFrame | None = None,
    ) -> None:
        """Append one collated batch, attaching visits where the interval
        join finds one (rows left with a null visit land in att=0 files).
        Every `repair_every` ingests, the scheduled repair pass runs
        against the CURRENT location_visits — the attach-later path the
        reference lacks."""
        if batch_id in self._manifest["batches"]:
            return  # replay
        if "visit_number" not in collated.columns:
            collated = collated.withColumn(
                "visit_number", F.lit(None).cast("string")
            )
        if location_visits is not None:
            collated = repair_orphan_waveforms(collated, location_visits)
        out = collated.withColumn(
            "att", F.col("visit_number").isNotNull().cast("int")
        )
        path = os.path.join(self.root, f"waveform/batch={batch_id}")
        out.repartition(1, F.col("att")).write.mode("overwrite").partitionBy(
            "att"
        ).parquet(path)
        self._manifest["batches"].append(batch_id)
        self._manifest["n_ingests"] += 1
        self._write_manifest()
        if (
            location_visits is not None
            and self._manifest["n_ingests"] % self.repair_every == 0
        ):
            self.repair(location_visits)

    def _orphan_paths(self) -> list[str]:
        paths = []
        for b in self._manifest["batches"]:
            p = os.path.join(self.root, f"waveform/batch={b}/att=0")
            if os.path.isdir(p):
                paths.append(p)
        return paths

    def _repair_paths(self) -> list[str]:
        return [
            os.path.join(self.root, f"repair/rep={r}")
            for r in self._manifest["repairs"]
        ]

    def repair(self, location_visits: DataFrame) -> int:
        """One scheduled repair pass: scan ONLY the orphan files, drop
        rows already repaired, re-join against the current intervals,
        append the newly attached rows. Returns rows repaired."""
        orphan_paths = self._orphan_paths()
        if not orphan_paths:
            return 0
        orphans = self.spark.read.parquet(*orphan_paths).drop("att")
        prior = self._read_repairs()
        if prior is not None:
            orphans = orphans.join(F.broadcast(prior.select(*_ID)), _ID, "left_anti")
        fixed = repair_orphan_waveforms(orphans, location_visits).filter(
            F.col("visit_number").isNotNull()
        )
        rep_id = (max(self._manifest["repairs"]) + 1) if self._manifest["repairs"] else 0
        path = os.path.join(self.root, f"repair/rep={rep_id}")
        fixed.write.mode("overwrite").parquet(path)
        n = self.spark.read.parquet(path).count()
        if n:
            self._manifest["repairs"].append(rep_id)
            self._write_manifest()
        return n

    # -- reads -------------------------------------------------------------
    def _read_repairs(self) -> DataFrame | None:
        paths = self._repair_paths()
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def read(self) -> DataFrame | None:
        """The full log: attached rows + repaired rows shadowing their
        orphan originals + still-unattached orphans."""
        if not self._manifest["batches"]:
            return None
        base = self.spark.read.option("basePath", self.root + "/waveform").parquet(
            *[
                os.path.join(self.root, f"waveform/batch={b}")
                for b in self._manifest["batches"]
            ]
        ).drop("att", "batch")
        repairs = self._read_repairs()
        if repairs is None:
            return base
        unshadowed = base.filter(F.col("visit_number").isNull()).join(
            F.broadcast(repairs.select(*_ID)), _ID, "left_anti"
        )
        return (
            base.filter(F.col("visit_number").isNotNull())
            .unionByName(repairs.select(*base.columns))
            .unionByName(unshadowed)
        )

    def orphan_count(self) -> int:
        df = self.read()
        return 0 if df is None else df.filter(F.col("visit_number").isNull()).count()
