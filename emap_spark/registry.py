"""Query registry: the single source of truth wired into __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers a named query
(callable (spark, sf_dir) -> DataFrame) and, when SQL-expressible, a
DuckDB oracle SQL string computing the same result on the same parquet
tables. The driver hash-compares the two at sf0.01.

Determinism rules for oracle-checked queries (so the value-hash matches):
- money/metric aggregations go through DECIMAL (order-insensitive exact
  arithmetic), then cast to DOUBLE and round — identical bits both engines;
- timestamps are exposed as epoch-microsecond BIGINTs (no tz/format drift);
- every computed column is aliased identically in Spark and SQL;
- top-k selections carry a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import emap_spark.plans.relational  # noqa: F401
    import emap_spark.plans.event_state  # noqa: F401
    import emap_spark.plans.text_dedup  # noqa: F401
    import emap_spark.plans.similarity  # noqa: F401
    import emap_spark.plans.emap_domain  # noqa: F401
    import emap_spark.plans.waveform_ops  # noqa: F401
    import emap_spark.plans.parse_media_ops  # noqa: F401


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in specs().items()}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in specs().items() if spec.oracle is not None}
