"""S9: Hoover-pattern incremental DB-polling source (the reference's
private repo; only the pattern is public — docs/dev/onboarding.md:
103-141): time-windowed incremental SQL against a reporting DB, one
QueryStrategy per data type.

Spark shape: a parameterized reader with a watermark-column predicate.
Locally the "DB" is any DataFrame-producing callable; in production
`spark.read.jdbc` with the same predicate pushed into the dbtable
subquery (partitioned on the watermark for parallel extraction at
scale).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class QueryStrategy:
    """One per data type (the reference's per-type strategy classes):
    how to load the table and which column advances the watermark."""

    name: str
    load: Callable[[], DataFrame]  # e.g. lambda: spark.read.jdbc(...)
    watermark_col: str
    lag_seconds: int = 0  # re-read safety margin for late commits


class HooverSource:
    """Incremental time-windowed polls with persisted per-type progress."""

    def __init__(self, progress_path: str) -> None:
        self.progress_path = progress_path

    def _progress(self) -> dict:
        if not os.path.exists(self.progress_path):
            return {}
        with open(self.progress_path) as f:
            return json.load(f)

    def _commit(self, name: str, high: str) -> None:
        p = self._progress()
        p[name] = high
        tmp = self.progress_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(p, f)
        os.replace(tmp, self.progress_path)

    def poll(self, strategy: QueryStrategy) -> tuple[DataFrame, str | None]:
        """Rows with watermark > (last - lag). Commit the returned high
        watermark only after durable processing (at-least-once; the lag
        re-reads a margin so late-committed DB rows are not skipped)."""
        df = strategy.load()
        last = self._progress().get(strategy.name)
        if last is not None:
            lo = F.lit(last).cast("timestamp_ntz") - F.expr(
                f"INTERVAL {strategy.lag_seconds} SECONDS"
            )
            df = df.filter(F.col(strategy.watermark_col) > lo)
        hi = df.agg(F.max(strategy.watermark_col).alias("m")).collect()[0].m
        return df, (str(hi) if hi is not None else None)

    def commit(self, strategy: QueryStrategy, high: str | None) -> None:
        if high is not None:
            self._commit(strategy.name, high)
