"""Lineage cuts for driver-side iterative loops (pointer doubling,
label propagation, per-batch state folding).

Why not ``localCheckpoint(eager=True)``: measured on Spark 4.1
(local mode), a loop of the form ``m = f(m, m).localCheckpoint(True)``
exhibits super-linear per-iteration slowdown — ~0.3 s/iteration for the
first ~14 iterations, then roughly doubling every iteration (6 s at
iteration 19, 50 s at 21) even though the logical plan stays a
single-node LogicalRDD and the partition count stays constant. A
parquet write+read roundtrip is flat-cost (~0.3 s/iteration for 25+
iterations), truncates lineage definitively, stays fully distributed
(no driver collect), and is exactly what a production job would do for
iteration state at 100 TB. Spill files live under an ephemeral
session-scoped directory and are removed on interpreter exit.
"""

from __future__ import annotations

import atexit
import itertools
import shutil
import tempfile

from pyspark.sql import DataFrame

_SPILL_DIR: str | None = None
_COUNTER = itertools.count()


def _spill_dir() -> str:
    global _SPILL_DIR
    if _SPILL_DIR is None:
        _SPILL_DIR = tempfile.mkdtemp(prefix="emap_spark_lineage_")
        atexit.register(shutil.rmtree, _SPILL_DIR, ignore_errors=True)
    return _SPILL_DIR


def cut(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and return a frame with no upstream lineage."""
    path = f"{_spill_dir()}/cut_{next(_COUNTER)}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
