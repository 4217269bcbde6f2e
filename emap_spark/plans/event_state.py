"""EMAP-shaped stateful query semantics over the `events` stream table
(SURVEY.md §2.3-§2.6): newer-wins latest-state (M4), last-non-null field
fill (M5), SCD2 validity intervals (M7/§1.2), as-of reconstruction (Q5),
gap detection (Q6), sessionization/occupancy intervals (Q7), dedupe (W4).

`events(event_id, ts, user_id, event_type, value, props)` plays the role
of the interchange message stream: user_id is the entity key, ts is
validFrom, event_type routes field updates.

Scale notes: every operator partitions by the entity key (user_id) —
one shuffle, then all window logic is within-partition. No driver-side
loops; state reconstruction is a window computation, not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from emap_spark.plans._util import davg, dec, dsum, sql_davg, sql_dsum, tlit, us
from emap_spark.registry import register
from emap_spark.sources.tables import load_table

ASOF_T = "2024-01-15 00:00:00"
SESSION_GAP_US = 24 * 3600 * 1_000_000  # 24h session gap
GAP_THRESHOLD_US = 48 * 3600 * 1_000_000  # 48h "missing data" gap


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# q20: newer-wins latest state per entity (merge rule M4)
# --------------------------------------------------------------------------
@register(
    "q20_latest_event_per_user",
    oracle="""
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
) WHERE rk = 1
""",
    doc="M4 newer-wins: argmax by (validFrom, seq) per entity key.",
)
def q20_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", us("ts").alias("ts_us"), "event_type", "value")
    )


# --------------------------------------------------------------------------
# q21: stream catalog + bounds (read-side Q1/Q2)
# --------------------------------------------------------------------------
@register(
    "q21_stream_bounds",
    oracle=f"""
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       min(epoch_us(ts)) AS first_ts_us,
       max(epoch_us(ts)) AS last_ts_us,
       {sql_dsum('value')} AS total_value,
       {sql_davg('value')} AS avg_value
FROM events
GROUP BY event_type
""",
    doc="Q1/Q2 stream catalog: per-stream bounds and volume.",
)
def q21_stream_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min(us("ts")).alias("first_ts_us"),
        F.max(us("ts")).alias("last_ts_us"),
        dsum("value").alias("total_value"),
        davg("value").alias("avg_value"),
    )


# --------------------------------------------------------------------------
# q22: last-non-null field fill = the merge engine's field folding (M5)
# --------------------------------------------------------------------------
@register(
    "q22_user_current_state",
    oracle="""
SELECT DISTINCT user_id,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER w AS last_purchase_value,
       last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END IGNORE NULLS)
         OVER w AS signup_ts_us,
       last_value(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS)
         OVER w AS last_error_value,
       count(*) OVER w AS n_events,
       count(CASE WHEN event_type = 'error' THEN 1 END) OVER w AS n_errors
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="M5 fill-if-null folding: per-entity last non-null value per field.",
)
def q22_user_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    purchase = F.when(F.col("event_type") == "purchase", F.col("value"))
    signup = F.when(F.col("event_type") == "signup", us("ts"))
    error = F.when(F.col("event_type") == "error", F.col("value"))
    return e.select(
        "user_id",
        F.last(purchase, ignorenulls=True).over(w).alias("last_purchase_value"),
        F.last(signup, ignorenulls=True).over(w).alias("signup_ts_us"),
        F.last(error, ignorenulls=True).over(w).alias("last_error_value"),
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", F.lit(1))).over(w).alias("n_errors"),
    ).distinct()


# --------------------------------------------------------------------------
# q23: SCD2 validity intervals (bitemporal audit shape, §1.2 / M7)
# --------------------------------------------------------------------------
@register(
    "q23_scd2_validity_intervals",
    oracle="""
SELECT user_id, event_id, event_type, value,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_until_us
FROM events
""",
    doc="M7 audit semantics: each version valid [validFrom, next.validFrom).",
)
def q23_scd2_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        us("ts").alias("valid_from_us"),
        us(F.lead("ts").over(w)).alias("valid_until_us"),
    )


# --------------------------------------------------------------------------
# q24: as-of reconstruction (Q5, AuditCore.isValidAsOf)
# --------------------------------------------------------------------------
@register(
    "q24_state_asof",
    oracle=f"""
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM events WHERE ts <= TIMESTAMP '{ASOF_T}'
) WHERE rk = 1
""",
    doc="Q5 as-of: entity state at time t (validFrom <= t < validUntil).",
)
def q24_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("ts") <= tlit(ASOF_T))
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", us("ts").alias("ts_us"), "event_type", "value")
    )


# --------------------------------------------------------------------------
# q25: gap detection (Q6, waveform validation wish list)
# --------------------------------------------------------------------------
@register(
    "q25_gap_detection",
    oracle=f"""
SELECT user_id, prev_ts_us, ts_us, ts_us - prev_ts_us AS gap_us
FROM (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts_us
  FROM events
) WHERE prev_ts_us IS NOT NULL AND ts_us - prev_ts_us > {GAP_THRESHOLD_US}
""",
    doc="Q6 gap detection: lag over per-stream window, integer-exact gaps.",
)
def q25_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        us("ts").alias("ts_us"),
        F.lag(us("ts")).over(w).alias("prev_ts_us"),
    )
    return gaps.filter(
        F.col("prev_ts_us").isNotNull()
        & ((F.col("ts_us") - F.col("prev_ts_us")) > GAP_THRESHOLD_US)
    ).select("user_id", "prev_ts_us", "ts_us", (F.col("ts_us") - F.col("prev_ts_us")).alias("gap_us"))


# --------------------------------------------------------------------------
# q26: sessionization (Q7 interval construction from events)
# --------------------------------------------------------------------------
@register(
    "q26_sessionization",
    oracle=f"""
SELECT user_id, session_id,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       count(*) AS n_events,
       {sql_dsum('value')} AS session_value
FROM (
  SELECT user_id, value, epoch_us(ts) AS ts_us,
         (sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > {SESSION_GAP_US}
                   THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
  FROM (
    SELECT *, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM events
  )
)
GROUP BY user_id, session_id
""",
    doc="Q7 intervals: gap-rule sessionization via cumulative window sum.",
)
def q26_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_prev = e.select(
        "user_id", "value", "ts", "event_id", F.lag(us("ts")).over(w).alias("prev_us")
    )
    new_session = F.when(
        F.col("prev_us").isNull() | ((us("ts") - F.col("prev_us")) > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = with_prev.select(
        "user_id",
        "value",
        us("ts").alias("ts_us"),
        F.sum(new_session).over(wcum).cast("long").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("session_value"),
    )


# --------------------------------------------------------------------------
# q27: time-bucket rollup (read-side dashboard aggregation)
# --------------------------------------------------------------------------
@register(
    "q27_hourly_rollup",
    oracle=f"""
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       count(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    doc="Dashboard rollup: date_trunc bucketing, partial-agg friendly.",
)
def q27_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(us("hour").alias("hour_us"), "event_type", "n_events", "total_value")
    )


# --------------------------------------------------------------------------
# q28: duplicate-delivery handling (W4)
# --------------------------------------------------------------------------
@register(
    "q28_dedupe_stats",
    oracle="""
SELECT count(*) AS n_total,
       count(DISTINCT event_id) AS n_distinct_ids,
       count(DISTINCT (user_id, ts)) AS n_distinct_user_ts,
       count(DISTINCT (user_id, event_type, ts)) AS n_logical
FROM events
""",
    doc="W4 at-least-once dedupe accounting on sourceMessageId analogues.",
)
def q28_dedupe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("event_id").alias("n_distinct_ids"),
        F.countDistinct("user_id", "ts").alias("n_distinct_user_ts"),
        F.countDistinct("user_id", "event_type", "ts").alias("n_logical"),
    )


# --------------------------------------------------------------------------
# q29: running per-entity accumulation (ordered window fold)
# --------------------------------------------------------------------------
@register(
    "q29_running_user_value",
    oracle="""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(sum(value::DECIMAL(12,4)) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE, 4) AS running_value
FROM events
""",
    doc="Ordered cumulative fold per entity (decimal-exact).",
)
def q29_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        us("ts").alias("ts_us"),
        F.round(F.sum(dec("value")).over(w).cast("double"), 4).alias("running_value"),
    )


# --------------------------------------------------------------------------
# q30: semi-structured props extraction (JSON payloads in messages)
# --------------------------------------------------------------------------
@register(
    "q30_props_json_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
""",
    doc="JSON payload extraction stays JVM-side (get_json_object).",
)
def q30_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return e.groupBy((k % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# q31: inter-event timing analytics (lead/lag arithmetic)
# --------------------------------------------------------------------------
@register(
    "q31_inter_event_timing",
    oracle="""
SELECT user_id,
       count(*) AS n_gaps,
       min(gap_us) AS min_gap_us,
       max(gap_us) AS max_gap_us,
       (sum(gap_us) // count(*))::BIGINT AS avg_gap_us
FROM (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
) WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
    doc="Inter-arrival statistics per stream (integer-exact microseconds).",
)
def q31_inter_event_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id", (us("ts") - F.lag(us("ts")).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.expr("sum(gap_us) div count(*)").alias("avg_gap_us"),
    )


# --------------------------------------------------------------------------
# q32: daily active users / distinct-per-bucket
# --------------------------------------------------------------------------
@register(
    "q32_daily_active_users",
    oracle="""
SELECT epoch_us(date_trunc('day', ts)) AS day_us,
       count(DISTINCT user_id) AS dau,
       count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS purchasers,
       count(*) AS n_events
FROM events
GROUP BY date_trunc('day', ts)
""",
    doc="Distinct-per-bucket rollup (DAU shape).",
)
def q32_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("purchasers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(us("day").alias("day_us"), "dau", "purchasers", "n_events")
    )


# --------------------------------------------------------------------------
# q103: salted aggregation over a manufactured hot key — the skew
# operator driven end-to-end through the driver's oracle gate
# --------------------------------------------------------------------------
@register(
    "q103_salted_hot_key_agg",
    oracle="""
SELECT user_id,
       count(*)::BIGINT AS n_events,
       count(DISTINCT event_type)::BIGINT AS n_types,
       max(event_id) AS max_event
FROM (SELECT CASE WHEN user_id % 3 = 0 THEN -1 ELSE user_id END AS user_id,
             event_type, event_id
      FROM events)
GROUP BY user_id
""",
    doc=(
        "Skew-immune aggregation (operators/skew.py): a third of all "
        "events collapse onto one hot key; salted_agg spreads the first "
        "shuffle over (key, salt) and combines per-salt partials, "
        "salted_count_distinct dedupes salted by the VALUE hash. The "
        "oracle is the plain GROUP BY — results must match exactly."
    ),
)
def q103_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.operators.skew import salted_agg, salted_count_distinct

    e = load_table(spark, sf_dir, "events").withColumn(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, F.lit(-1)).otherwise(F.col("user_id")),
    )
    counts = salted_agg(
        e,
        ["user_id"],
        [("event_id", "count", "n_events"), ("event_id", "max", "max_event")],
        n_salt=16,
    )
    types = salted_count_distinct(e, ["user_id"], "event_type", n_salt=16)
    return counts.join(types, "user_id").select(
        "user_id",
        "n_events",
        F.col("n_distinct_event_type").alias("n_types"),
        "max_event",
    )
