"""Bucketed co-located joins: the 100 TB strategy for the star schema's
repeated fact-to-fact joins (lab_order ⋈ lab_result on sample id,
orders ⋈ customer on custkey). Writing both sides bucketed+sorted by
the join key makes the join exchange-free — no shuffle at plan time,
verified here against the physical plan."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from emap_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, sf_dir, no_broadcast):
    tag = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"orders_b_{tag}", f"customer_b_{tag}"
    try:
        load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_custkey").sortBy(
            "o_custkey"
        ).mode("overwrite").saveAsTable(t_orders)
        load_table(spark, sf_dir, "customer").write.bucketBy(8, "c_custkey").sortBy(
            "c_custkey"
        ).mode("overwrite").saveAsTable(t_cust)

        joined = spark.table(t_orders).join(
            spark.table(t_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed sides: the join reads buckets directly —
        # no shuffle exchange anywhere in the plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan

        # and it computes the right thing
        n = joined.count()
        plain = load_table(spark, sf_dir, "orders").join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert n == plain.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")


def test_bucketed_aggregation_skips_exchange(spark, sf_dir, no_broadcast):
    tag = uuid.uuid4().hex[:8]
    t = f"lineitem_b_{tag}"
    try:
        load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).mode("overwrite").saveAsTable(t)
        agg = spark.table(t).groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n_lines")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # grouping by the bucket key needs no exchange either
        assert "Exchange hashpartitioning" not in plan, plan
        assert agg.count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
