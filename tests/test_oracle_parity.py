"""Replicates the driver's correctness gate at sf0.001: every registered
query with an oracle must match DuckDB on row count, columns, and values."""

from __future__ import annotations

import duckdb
import pytest

from emap_spark.registry import specs
from emap_spark.sources.tables import TABLES
from tools.check_correctness import compare

_SPECS = specs()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = _SPECS[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only contract: the query must at least run deterministically
        assert sdf is not None
        return
    odf = duck.execute(spec.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
