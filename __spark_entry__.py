"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on /root/testdata/sf0.001
queries()      -> name -> (spark, sf_dir) -> DataFrame, one per operator
oracle_sql()   -> name -> DuckDB SQL computing the identical result

Implementation lives in the emap_spark package (see SURVEY.md §2 for the
operator inventory each query maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from emap_spark.registry import queries as _queries

    return _queries()["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from emap_spark.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from emap_spark.registry import oracles as _oracles

    return _oracles()
