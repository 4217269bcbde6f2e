"""Physical-plan regression tests: the scale properties the engine
relies on (SURVEY §4) must survive refactors — predicate pushdown to the
parquet scan, column pruning, broadcast of dimension tables."""

from __future__ import annotations

import pytest

from emap_spark.registry import queries

QS = queries()


def plan_of(spark, sf_dir, name: str) -> str:
    return QS[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reaches the scan
    # pruning: only the 6 needed columns are read, not all 11
    assert "l_orderkey" not in plan.split("ReadSchema:")[1]


def test_q03_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q03_local_supplier_revenue")
    assert plan.count("BroadcastHashJoin") >= 4  # dims broadcast, no SMJ
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed down


def test_q06_all_predicates_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q06_revenue_forecast")
    assert "GreaterThanOrEqual(l_shipda" in plan
    read = plan.split("ReadSchema:")[1]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read
    assert "l_returnflag" not in read


def test_events_scan_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q20_latest_event_per_user")
    read = plan.split("ReadSchema:")[1]
    assert "props" not in read  # unused JSON column not read


def test_knn_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q50_knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
