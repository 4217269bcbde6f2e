"""P7: blue/green star-schema publication.

The reference rebuilds its star schema offline into a SECOND schema and
swaps a synonym so consumers never see a half-built warehouse
(docs/technical_overview/Technical_overview_of_EMAP.md:136-140:
star_a / star_b with a `star` alias switched at cutover). The Spark
re-expression: two versioned parquet roots + catalog views as the
alias — `CREATE OR REPLACE TEMP VIEW` is an atomic catalog update, so

  * new queries resolve the alias to the freshly published side;
  * queries (DataFrames) planned BEFORE the swap keep reading the side
    they bound to — files are immutable and both sides stay on disk, so
    a long scan is never interrupted mid-flight;
  * a pointer file records the active side for restarts.

At cluster scale the same shape is `CREATE OR REPLACE VIEW` in a shared
metastore (or a Delta/Iceberg table-version pin); only the catalog call
changes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

SIDES = ("a", "b")


class BlueGreenCatalog:
    """Two-sided star-schema roots with an atomically swappable alias."""

    def __init__(self, spark: SparkSession, root: str, name: str = "star") -> None:
        if name and not name.isidentifier():
            raise ValueError(f"alias {name!r} must be a SQL identifier")
        self.spark = spark
        self.root = root
        self.name = name

    # -- layout ------------------------------------------------------------
    def _side_path(self, side: str, table: str) -> str:
        return os.path.join(self.root, f"{self.name}_{side}", table)

    def _pointer_path(self) -> str:
        return os.path.join(self.root, f"_{self.name}_active.json")

    def active_side(self) -> str | None:
        p = self._pointer_path()
        if not os.path.isfile(p):
            return None
        with open(p) as fh:
            return json.load(fh)["side"]

    def inactive_side(self) -> str:
        """The side a rebuild should publish into."""
        cur = self.active_side()
        return "a" if cur != "a" else "b"

    # -- publish + swap ----------------------------------------------------
    def publish(self, side: str, tables: dict[str, DataFrame]) -> None:
        """Write a full rebuild into one side (offline — readers keep
        using the active side's immutable files)."""
        if side not in SIDES:
            raise ValueError(f"side must be one of {SIDES}, got {side!r}")
        for table, df in tables.items():
            df.write.mode("overwrite").parquet(self._side_path(side, table))

    def swap(self, side: str) -> None:
        """Point the `star` alias views at a published side and record it
        in the pointer file.

        Atomicity contract (ADVICE r4): each `CREATE OR REPLACE VIEW` is
        an atomic catalog update, but the swap as a whole is atomic
        PER VIEW, not across views — a reader that resolves the alias for
        several tables WHILE swap() runs can bind fact and dimension
        views to different sides. Consumers that need a cross-table-
        consistent read must either plan through :meth:`snapshot` (one
        pointer read, every frame bound to the same side) or simply not
        overlap planning with a cutover. All view DEFINITIONS are staged
        (read + analyzed) before the first catalog replacement, so a
        publish error cannot leave a half-replaced catalog; a process
        crash mid-replacement is self-healing — the pointer still names
        the old side and attach()/swap() rebuilds every view from it."""
        if side not in SIDES:
            raise ValueError(f"side must be one of {SIDES}, got {side!r}")
        side_root = os.path.join(self.root, f"{self.name}_{side}")
        # stage: analyze every side table BEFORE touching the catalog
        staged = {
            table: self.spark.read.parquet(self._side_path(side, table))
            for table in sorted(os.listdir(side_root))
        }
        for table, df in staged.items():
            df.createOrReplaceTempView(f"{self.name}_{table}")
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"side": side}, fh)
        os.replace(tmp, self._pointer_path())

    def attach(self) -> None:
        """Restart path: re-create the alias views for the recorded
        active side (views are session-scoped; the pointer is not)."""
        side = self.active_side()
        if side is None:
            raise ValueError(f"no active side recorded under {self.root}")
        self.swap(side)

    # -- reads -------------------------------------------------------------
    def table(self, table: str) -> DataFrame:
        """Read through the alias — always the ACTIVE side for new
        queries; a DataFrame obtained earlier keeps its bound side.
        For a multi-table query that must not straddle a concurrent
        cutover, use :meth:`snapshot` instead (see the swap() atomicity
        contract)."""
        return self.spark.table(f"{self.name}_{table}")

    def snapshot(self) -> dict[str, DataFrame]:
        """Side-consistent multi-table read: resolve the active side ONCE
        (one pointer read) and bind every table's DataFrame directly to
        that side's immutable files — a concurrent swap() cannot split
        the set across sides, and the files stay on disk until the side
        is next republished, so in-flight scans are never interrupted."""
        side = self.active_side()
        if side is None:
            raise ValueError(f"no active side recorded under {self.root}")
        side_root = os.path.join(self.root, f"{self.name}_{side}")
        return {
            table: self.spark.read.parquet(self._side_path(side, table))
            for table in sorted(os.listdir(side_root))
        }
