"""Relational query surface (SURVEY.md §2.6/§2.7): scans, equi joins,
broadcast joins, semi/anti joins, disjunctive-key joins, aggregations,
window top-k — expressed declaratively so Catalyst does pushdown,
pruning, join selection and AQE does runtime re-planning.

Scale notes (100 TB): every query here keeps filters/projection next to
the scan (parquet pushdown), joins dimension tables small-side
(broadcast under AQE), and aggregates with map-side partials. No
collect-based loops; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from emap_spark.plans._util import davg, dec, dsum, sql_davg, sql_dsum, tlit, us
from emap_spark.registry import register
from emap_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01: pricing summary (TPC-H Q1 shape: scan + filter + grouped agg)
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       round(sum((l_extendedprice::DECIMAL(12,4)) * ((1 - l_discount)::DECIMAL(12,4)))::DOUBLE, 2) AS sum_disc_price,
       round(sum((l_extendedprice::DECIMAL(12,4)) * ((1 - l_discount)::DECIMAL(12,4)) * ((1 + l_tax)::DECIMAL(12,4)))::DOUBLE, 2) AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary; decimal-exact aggregation.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= tlit("1998-09-02")
    )
    disc_price = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    charge = disc_price * dec(1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
        F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# q02: shipping priority (TPC-H Q3 shape: 3-way join + agg + top-k)
# --------------------------------------------------------------------------
@register(
    "q02_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum((l_extendedprice::DECIMAL(12,4)) * ((1 - l_discount)::DECIMAL(12,4)))::DOUBLE, 2) AS revenue,
       epoch_us(o_orderdate) AS o_orderdate_us,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum((l_extendedprice::DECIMAL(12,4)) * ((1 - l_discount)::DECIMAL(12,4))) DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shipping priority; top-10 with decimal-exact ordering.",
)
def q02_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = tlit("1998-03-15")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("_rev_dec").cast("double"), 2).alias("revenue"),
            us("o_orderdate").alias("o_orderdate_us"),
            "o_orderpriority",
        )
    )


# --------------------------------------------------------------------------
# q03: local supplier revenue (TPC-H Q5 shape: 6-way join incl. dims)
# --------------------------------------------------------------------------
@register(
    "q03_local_supplier_revenue",
    oracle="""
SELECT n_name,
       round(sum((l_extendedprice::DECIMAL(12,4)) * ((1 - l_discount)::DECIMAL(12,4)))::DOUBLE, 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    doc="TPC-H Q5 local supplier revenue; dims broadcast by Catalyst.",
)
def q03_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= tlit("1996-01-01"))
        & (F.col("o_orderdate") < tlit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q04: order priority check (TPC-H Q4 shape: semi join)
# --------------------------------------------------------------------------
@register(
    "q04_order_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 order priority; left-semi join with non-equi condition.",
)
def q04_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= tlit("1997-01-01"))
        & (F.col("o_orderdate") < tlit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# q05: customer value by geography (dim joins + multi-agg)
# --------------------------------------------------------------------------
@register(
    "q05_customer_value_by_nation",
    oracle=f"""
SELECT r_name, n_name,
       count(*) AS n_customers,
       {sql_dsum('c_acctbal')} AS total_acctbal,
       {sql_davg('c_acctbal')} AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    doc="Customer rollup by geography (broadcast dims).",
)
def q05_customer_value_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
            davg("c_acctbal").alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# q06: revenue forecast (TPC-H Q6 shape: pure scan-side filter + scalar agg)
# --------------------------------------------------------------------------
@register(
    "q06_revenue_forecast",
    oracle="""
SELECT round(sum((l_extendedprice::DECIMAL(12,4)) * (l_discount::DECIMAL(12,4)))::DOUBLE, 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity < 24
""",
    doc="TPC-H Q6; all predicates pushed to the parquet scan.",
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= tlit("1996-01-01"))
        & (F.col("l_shipdate") < tlit("1997-01-01"))
        & (F.col("l_discount").between(0.02, 0.08))
        & (F.col("l_quantity") < 24)
    )
    rev = dec("l_extendedprice") * dec("l_discount")
    return l.agg(
        F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# q07: part catalog stats (grouped agg with min/max)
# --------------------------------------------------------------------------
@register(
    "q07_part_brand_stats",
    oracle=f"""
SELECT p_brand,
       count(*) AS n_parts,
       count(DISTINCT p_type) AS n_types,
       min(p_size) AS min_size,
       max(p_size) AS max_size,
       {sql_davg('p_retailprice')} AS avg_retail
FROM part
GROUP BY p_brand
""",
    doc="Part catalog rollup per brand.",
)
def q07_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_type").alias("n_types"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
        davg("p_retailprice").alias("avg_retail"),
    )


# --------------------------------------------------------------------------
# q08: top parts by revenue (fact agg -> dim join -> top-k)
# --------------------------------------------------------------------------
@register(
    "q08_top_parts_by_revenue",
    oracle="""
SELECT l_partkey, p_name, p_brand,
       round(sum((l_extendedprice::DECIMAL(12,4)) * ((1 - l_discount)::DECIMAL(12,4)))::DOUBLE, 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY l_partkey, p_name, p_brand
ORDER BY sum((l_extendedprice::DECIMAL(12,4)) * ((1 - l_discount)::DECIMAL(12,4))) DESC, l_partkey
LIMIT 15
""",
    doc="Aggregate-then-join ordering: shrink the fact side before the dim join.",
)
def q08_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    rev = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    agg = l.groupBy("l_partkey").agg(
        F.sum(rev).alias("_rev_dec"), F.count(F.lit(1)).alias("n_lineitems")
    )
    return (
        agg.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .orderBy(F.col("_rev_dec").desc(), F.col("l_partkey"))
        .limit(15)
        .select(
            "l_partkey",
            "p_name",
            "p_brand",
            F.round(F.col("_rev_dec").cast("double"), 2).alias("revenue"),
            "n_lineitems",
        )
    )


# --------------------------------------------------------------------------
# q09: disjunctive-key join (SURVEY §2.7 findByMrnOrNhsNumber analogue)
# --------------------------------------------------------------------------
@register(
    "q09_disjunctive_customer_match",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
   OR c_custkey IN (SELECT user_id FROM events WHERE event_type = 'signup')
""",
    doc=(
        "OR-of-keys lookup: Spark can't hash-join a disjunction, so it is a "
        "union of two semi joins + dedupe (reference PersonController.java:174)."
    ),
)
def q09_disjunctive_customer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    big_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("k"))
    )
    signups = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("k"))
    )
    m1 = c.join(big_orders, c.c_custkey == big_orders.k, "left_semi")
    m2 = c.join(signups, c.c_custkey == signups.k, "left_semi")
    return m1.unionByName(m2).distinct()


# --------------------------------------------------------------------------
# q10: window top-k per group (ORDER BY finder queries, SURVEY §2.7)
# --------------------------------------------------------------------------
@register(
    "q10_top_orders_per_customer",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
    doc="Per-key top-k via row_number window (no global sort).",
)
def q10_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# q11: anti join / NOT EXISTS (TPC-H Q22 shape)
# --------------------------------------------------------------------------
@register(
    "q11_customers_without_orders",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_customers,
       round(sum(c_acctbal::DECIMAL(12,4))::DOUBLE, 2) AS total_acctbal
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
GROUP BY c_mktsegment
""",
    doc="Q22 shape: positive-balance customers with no large orders (left-anti).",
)
def q11_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# q12: correlated max-per-group join (TPC-H Q2 shape)
# --------------------------------------------------------------------------
@register(
    "q12_top_supplier_per_nation",
    oracle="""
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM supplier s
JOIN nation ON s.s_nationkey = n_nationkey
WHERE s.s_acctbal = (
  SELECT max(s2.s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
)
""",
    doc=(
        "Q2 shape: correlated max subquery -> window max + equality filter "
        "(one shuffle, no self-join)."
    ),
)
def q12_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = W.partitionBy("s_nationkey")
    top = s.withColumn("_mx", F.max("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("_mx")
    )
    return top.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "n_name", "s_suppkey", "s_name", "s_acctbal"
    )


# --------------------------------------------------------------------------
# q13: full outer join reconciliation (validation-style Q8)
# --------------------------------------------------------------------------
@register(
    "q13_customer_event_reconciliation",
    oracle="""
SELECT CASE WHEN c.c_custkey IS NULL THEN 'events_only'
            WHEN e.user_id IS NULL THEN 'customers_only'
            ELSE 'both' END AS presence,
       count(*) AS n
FROM customer c
FULL OUTER JOIN (SELECT DISTINCT user_id FROM events) e
  ON c.c_custkey = e.user_id
GROUP BY 1
""",
    doc="Q8 validation diff shape: full outer join + presence classification.",
)
def q13_customer_event_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    e = _t(spark, sf_dir, "events").select("user_id").distinct()
    j = c.join(e, F.col("c_custkey") == F.col("user_id"), "full_outer")
    presence = (
        F.when(F.col("c_custkey").isNull(), F.lit("events_only"))
        .when(F.col("user_id").isNull(), F.lit("customers_only"))
        .otherwise(F.lit("both"))
    )
    return j.groupBy(presence.alias("presence")).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# q14: string expression surface
# --------------------------------------------------------------------------
@register(
    "q14_part_name_analysis",
    oracle="""
SELECT upper(substr(p_type, 1, 5)) AS type_prefix,
       count(*) AS n_parts,
       count(CASE WHEN p_name LIKE '%green%' THEN 1 END) AS n_green,
       round(sum(length(p_name)::DECIMAL(12,4))::DOUBLE / count(*), 4) AS avg_name_len
FROM part
GROUP BY 1
""",
    doc="String functions stay JVM-side: upper/substr/like/length.",
)
def q14_part_name_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy(
        F.upper(F.substring("p_type", 1, 5)).alias("type_prefix")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.count(F.when(F.col("p_name").like("%green%"), 1)).alias("n_green"),
        F.round(
            F.sum(F.length("p_name").cast("decimal(12,4)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_name_len"),
    )


# --------------------------------------------------------------------------
# q15: conditional aggregation (pivot-style)
# --------------------------------------------------------------------------
@register(
    "q15_order_status_pivot",
    oracle="""
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END::DECIMAL(12,4))::DOUBLE, 2) AS value_f
FROM orders
GROUP BY o_orderpriority
""",
    doc="Pivot via conditional aggregation (map-side combinable).",
)
def q15_order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    def n_status(s):
        return F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
    return o.groupBy("o_orderpriority").agg(
        n_status("F"),
        n_status("O"),
        n_status("P"),
        F.round(
            F.sum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
                .otherwise(F.lit(0))
                .cast("decimal(12,4)")
            ).cast("double"),
            2,
        ).alias("value_f"),
    )


# --------------------------------------------------------------------------
# q16: rollup aggregation (subtotal hierarchy)
# --------------------------------------------------------------------------
@register(
    "q16_rollup_pricing",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       round(sum(l_quantity::DECIMAL(12,4))::DOUBLE, 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    doc="ROLLUP subtotals: Spark rollup() and SQL GROUP BY ROLLUP agree on null markers.",
)
def q16_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# q17: set operations (INTERSECT / EXCEPT)
# --------------------------------------------------------------------------
@register(
    "q17_set_operations",
    oracle="""
SELECT
  (SELECT count(*) FROM (
     SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_totalprice > 150000)) AS n_intersect,
  (SELECT count(*) FROM (
     SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     EXCEPT
     SELECT o_custkey FROM orders WHERE o_totalprice > 150000)) AS n_except
""",
    doc="INTERSECT/EXCEPT set semantics (distinct), compiled to semi/anti joins.",
)
def q17_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("k"))
    )
    inter = b.intersect(big).count()
    exc = b.exceptAll(big.distinct()).distinct().count()
    return spark.createDataFrame([(inter, exc)], "n_intersect long, n_except long")


# --------------------------------------------------------------------------
# q18: exact percentiles (interpolated quantiles)
# --------------------------------------------------------------------------
@register(
    "q18_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Exact interpolated percentiles (Spark percentile == quantile_cont).",
)
def q18_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75_price"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# q19: regex extraction + calendar bucketing
# --------------------------------------------------------------------------
@register(
    "q19_brand_weekday_histogram",
    oracle="""
SELECT CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) % 5 AS brand_bucket,
       dayname(l_shipdate) AS ship_day,
       count(*) AS n,
       round(sum(l_extendedprice::DECIMAL(12,4))::DOUBLE, 2) AS total_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
""",
    doc="regexp_extract + day-name bucketing (dayname avoids engine dow-numbering drift).",
)
def q19_brand_weekday_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    bucket = (F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int") % 5).alias("brand_bucket")
    return j.groupBy(
        bucket, F.date_format("l_shipdate", "EEEE").alias("ship_day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("total_price"),
    )
