"""Driver entries for the streaming/waveform/location operators
(SURVEY §2.1 S12, §2.4 D6/D19, §2.5 W1/W7, §2.6 Q6/Q7). These run the
REAL operators (stateful collation, interval inference, retention) on
deterministic generated input; each has a DuckDB oracle that re-derives
the same input from range() arithmetic and recomputes the expected
output independently in SQL, so the driver's hash gate covers the
operator end-to-end.

Determinism notes: sample values are round(sin, 6) at generation (libm
vs JVM sin agree far below 1e-6), float sums are exposed as exact
integer micro-units, and timestamps as epoch-µs BIGINTs. Integer
division mirrors Spark's double->long truncation (DuckDB CAST rounds,
`//` floors — floor == truncate for the non-negative values here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.operators.locations import infer_location_visits
from emap_spark.registry import register
from emap_spark.sources.generators import adt_messages, waveform_stream
from emap_spark.streaming.collation import collate_batch, gap_report
from emap_spark.streaming.pipeline import retention_sweep

_EPOCH_2024 = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs

# Shared SQL: regenerate the sine-wave message stream for (P patients,
# rate R, S seconds, 5 samples/msg), chunk it exactly like the collator
# (islands break on dropped messages; chunks of `target` samples within
# an island; chunk c of an island starts island_start + c*target/rate).
def _chunk_sql(
    n_patients: int,
    rate: int,
    seconds: int,
    target: int,
    drop_where: str = "FALSE",
) -> str:
    mpp = (seconds * rate) // 5
    return f"""
msgs AS (
  SELECT (i % {n_patients}) AS patient,
         (i // {n_patients}) * 5 AS k0,
         ((i // {n_patients}) * 5 * 1000000) // {rate} AS obs_us
  FROM range({n_patients} * {mpp}) t(i)
),
kept AS (SELECT * FROM msgs WHERE NOT ({drop_where})),
isl AS (
  SELECT *, CASE WHEN k0 - lag(k0) OVER (PARTITION BY patient ORDER BY k0) = 5
                 THEN 0 ELSE 1 END AS brk
  FROM kept
),
isl2 AS (
  SELECT *, SUM(brk) OVER (PARTITION BY patient ORDER BY k0) AS island
  FROM isl
),
samples AS (
  SELECT patient, island, k0 + j AS k
  FROM isl2, range(5) s(j)
),
ranked AS (
  SELECT patient, island, k,
         (row_number() OVER (PARTITION BY patient, island ORDER BY k) - 1) // {target}
           AS chunk
  FROM samples
),
lastisl AS (SELECT patient, max(island) AS last_island FROM isl2 GROUP BY patient),
chunks AS (
  SELECT r.patient, r.island, r.chunk,
         count(*) AS n_samples,
         SUM(CAST(round(abs(round(100 * sin(2 * pi() * r.k / {rate}.0), 6))
                        * 1000000) AS BIGINT)) AS abs_sum_micro
  FROM ranked r GROUP BY r.patient, r.island, r.chunk
),
islstart AS (
  SELECT patient, island, (min(k) * 1000000) // {rate} AS isl_start_us
  FROM samples GROUP BY patient, island
),
bounds AS (
  SELECT c.patient, c.island, c.chunk, c.n_samples, c.abs_sum_micro,
         {_EPOCH_2024} + s.isl_start_us
           + c.chunk * {target * 1_000_000 // rate} AS start_us,
         {_EPOCH_2024} + s.isl_start_us
           + c.chunk * {target * 1_000_000 // rate}
           + (c.n_samples * 1000000) // {rate} AS end_us,
         CASE WHEN c.n_samples = {target} THEN 'full'
              WHEN c.island = l.last_island THEN 'timeout'
              ELSE 'gap' END AS is_final_partial
  FROM chunks c
  JOIN islstart s USING (patient, island)
  JOIN lastisl l USING (patient)
)
"""


_LOC = "printf('T%02dE^T%02dE BY02^BY02-%02d', patient, patient, patient)"

_Q70_ORACLE = f"""
WITH {_chunk_sql(4, 300, 60, 3000)}
SELECT {_LOC} AS source_location,
       '52912' AS source_stream_id,
       start_us AS obs_us,
       n_samples::BIGINT AS n_samples,
       is_final_partial,
       abs_sum_micro::BIGINT AS abs_sum_micro
FROM bounds
"""


@register(
    "q70_waveform_collation",
    oracle=_Q70_ORACLE,
    doc=(
        "W1 collation over the S12 sine generator: 4 patients x 300 Hz x "
        "60 s in 5-sample HL7-sized messages -> 3000-sample array rows "
        "(the reference's 10 s @300 Hz row target); oracle re-chunks the "
        "regenerated sample stream in SQL."
    ),
)
def q70_waveform_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=4, sampling_rate=300, seconds=60)
    collated = collate_batch(msgs, target_samples=3000)
    return collated.select(
        "source_location",
        "source_stream_id",
        F.unix_micros(F.col("observation_datetime").cast("timestamp")).alias("obs_us"),
        "n_samples",
        "is_final_partial",
        F.aggregate(
            "values_array",
            F.lit(0).cast("long"),
            lambda a, x: a + F.round(F.abs(x) * 1_000_000).cast("long"),
        ).alias("abs_sum_micro"),
    )


_Q71_ORACLE = f"""
WITH {_chunk_sql(2, 300, 30, 3000,
                       drop_where="patient = 0 AND obs_us BETWEEN 10000000 AND 12000000")},
seq AS (
  SELECT *, lag(end_us) OVER (PARTITION BY patient ORDER BY start_us) AS prev_end_us
  FROM bounds
)
SELECT {_LOC} AS source_location,
       '52912' AS source_stream_id,
       start_us, end_us, prev_end_us,
       (start_us - prev_end_us) AS gap_us
FROM seq
WHERE prev_end_us IS NOT NULL AND abs(start_us - prev_end_us) > 2000
"""


@register(
    "q71_waveform_gap_report",
    oracle=_Q71_ORACLE,
    doc="Q6 gap detection on a stream with a dropped message window.",
)
def q71_waveform_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=2, sampling_rate=300, seconds=30)
    # drop 2 s of data from one stream -> a gap the collator must not bridge
    gap_lo = F.lit("2024-01-01 00:00:10").cast("timestamp_ntz")
    gap_hi = F.lit("2024-01-01 00:00:12").cast("timestamp_ntz")
    gappy = msgs.filter(
        ~(
            (F.col("source_location").startswith("T00"))
            & F.col("observation_time").between(gap_lo, gap_hi)
        )
    )
    return gap_report(collate_batch(gappy, target_samples=3000))


_Q72_ORACLE = """
SELECT printf('ENC%05d', i) AS visit_number,
       printf(v.fmt, i % 5) AS location_string,
       epoch_us(make_timestamp(2024, 1, CAST(1 + (i % 20) + v.ad AS INT),
                               v.ah, 0, 0)) AS admission_us,
       epoch_us(make_timestamp(2024, 1, CAST(1 + (i % 20) + v.dd AS INT),
                               v.dh, 0, 0)) AS discharge_us,
       FALSE AS inferred_admission,
       FALSE AS inferred_discharge
FROM range(25) t(i),
     (VALUES ('T%dE^BY01^BED-1', 0, 8, 0, 12),
             ('T%dE^BY02^BED-2', 0, 12, 0, 18),
             ('T%dE^BY03^BED-3', 0, 18, 1, 10)) v(fmt, ad, ah, dd, dh)
"""


@register(
    "q72_location_visit_inference",
    oracle=_Q72_ORACLE,
    doc="D6 recompute: admit/transfer/discharge history -> interval rows.",
)
def q72_location_visit_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    lv = infer_location_visits(adt_messages(spark, n_patients=25))
    return lv.select(
        "visit_number",
        "location_string",
        F.unix_micros(F.col("admission_datetime").cast("timestamp")).alias("admission_us"),
        F.unix_micros(F.col("discharge_datetime").cast("timestamp")).alias("discharge_us"),
        "inferred_admission",
        "inferred_discharge",
    )


_Q73_ORACLE = """
WITH chunks AS (
  SELECT printf('T%dE^BY02^BED-2', pl) AS source_location, c.c
  FROM range(5) t(pl), range(3) c(c)
),
lv AS (
  SELECT printf('T%dE^BY02^BED-2', p % 5) AS location_string,
         printf('ENC%05d', p) AS visit_number,
         make_timestamp(2024, 1, CAST(1 + p AS INT), 12, 0, 0) AS adm,
         make_timestamp(2024, 1, CAST(1 + p AS INT), 18, 0, 0) AS dis
  FROM range(10) t(p)
),
att AS (
  SELECT ch.source_location, l.visit_number
  FROM chunks ch
  LEFT JOIN lv l
    ON ch.source_location = l.location_string
   AND make_timestamp(2024, 1, 1, 12, 30, 0) + to_microseconds(ch.c * 10000000)
       >= l.adm
   AND make_timestamp(2024, 1, 1, 12, 30, 0) + to_microseconds(ch.c * 10000000)
       < l.dis
)
SELECT source_location,
       count(*)::BIGINT AS n_rows,
       count(visit_number)::BIGINT AS n_attached,
       SUM(CASE WHEN visit_number IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans
FROM att GROUP BY source_location
"""


@register(
    "q73_waveform_visit_attach",
    oracle=_Q73_ORACLE,
    doc=(
        "D19 point-in-time attach: collated waveform rows interval-join to "
        "the LocationVisit covering (location, observation_time); unmatched "
        "rows stay orphans with null encounter (WaveformController.java:60-66)."
    ),
)
def q73_waveform_visit_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    lv = infer_location_visits(adt_messages(spark, n_patients=10))
    msgs = waveform_stream(
        spark, n_patients=10, sampling_rate=300, seconds=30, start="2024-01-01 12:30:00"
    ).withColumn(
        "source_location",
        F.format_string(
            "T%dE^BY02^BED-2",
            F.substring(F.col("source_location"), 2, 2).cast("int") % 5,
        ),
    )
    # two patients collide per location/stream by construction: their
    # duplicate timestamps land in the dead-letter channel; only real
    # waveform rows attach to visits
    from emap_spark.streaming.collation import DUPLICATE_REASON

    collated = collate_batch(msgs, target_samples=3000).filter(
        F.col("is_final_partial") != DUPLICATE_REASON
    )
    attached = collated.join(
        lv,
        (F.col("source_location") == F.col("location_string"))
        & (F.col("observation_datetime") >= F.col("admission_datetime"))
        & (
            F.col("discharge_datetime").isNull()
            | (F.col("observation_datetime") < F.col("discharge_datetime"))
        ),
        "left",
    )
    return attached.groupBy("source_location").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("visit_number")).alias("n_attached"),
        F.sum(F.when(F.col("visit_number").isNull(), 1).otherwise(0)).alias("n_orphans"),
    )


_Q74_ORACLE = """
WITH msgs AS (
  SELECT (i % 2) AS patient,
         ((i // 2) * 5 * 1000000) // 50 AS obs_us
  FROM range(2 * 1200) t(i)
),
mx AS (SELECT max(obs_us) AS m FROM msgs)
SELECT printf('T%02dE^T%02dE BY02^BY02-%02d', patient, patient, patient)
         AS source_location,
       count(*)::BIGINT AS n_before,
       SUM(CASE WHEN obs_us >= (SELECT m FROM mx) THEN 1 ELSE 0 END)::BIGINT
         AS n_after
FROM msgs GROUP BY patient
"""


@register(
    "q74_waveform_retention",
    oracle=_Q74_ORACLE,
    doc="K4/W7 retention sweep baselined on max(observation_datetime).",
)
def q74_waveform_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=2, sampling_rate=50, seconds=120)
    kept = retention_sweep(msgs, ts_col="observation_time", retention_hours=0)
    # retention_hours=0 keeps only rows at the max timestamp boundary
    all_n = msgs.groupBy("source_location").agg(F.count(F.lit(1)).alias("n_before"))
    kept_n = kept.groupBy("source_location").agg(F.count(F.lit(1)).alias("n_after"))
    return all_n.join(kept_n, "source_location", "left").select(
        "source_location", "n_before", F.coalesce("n_after", F.lit(0)).alias("n_after")
    )


# Q1: stream catalog — distinct (location, stream) dims + per-stream
# message counts and time bounds (monitoring/streamlit/database_utils.py
# :26-54 get_all_params + get_min_max_time_for_single_stream)
_Q93_ORACLE = f"""
WITH msgs AS (
  SELECT (i % 3) AS patient,
         {_EPOCH_2024} + ((i // 3) * 5 * 1000000) // 100 AS obs_us
  FROM range(3 * 200) t(i)
)
SELECT printf('T%02dE^T%02dE BY02^BY02-%02d', patient, patient, patient)
         AS source_location,
       '52912' AS source_stream_id,
       'ECG' AS stream_name,
       100 AS sampling_rate,
       'mV' AS unit,
       count(*)::BIGINT AS n_messages,
       min(obs_us) AS min_obs_us,
       max(obs_us) AS max_obs_us
FROM msgs GROUP BY patient
"""


@register(
    "q93_waveform_stream_catalog",
    oracle=_Q93_ORACLE,
    doc=(
        "Q1 stream catalog: distinct stream dims + per-stream bounds "
        "(database_utils.py:26-54); compiles to one partial-aggregated "
        "groupBy, no join needed on the denormalized stream."
    ),
)
def q93_waveform_stream_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=3, sampling_rate=100, seconds=10)
    return msgs.groupBy(
        "source_location",
        "source_stream_id",
        F.col("mapped_stream_description").alias("stream_name"),
        "sampling_rate",
        "unit",
    ).agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.min(F.unix_micros(F.col("observation_time").cast("timestamp"))).alias("min_obs_us"),
        F.max(F.unix_micros(F.col("observation_time").cast("timestamp"))).alias("max_obs_us"),
    )


# Q3: time-range ordered per-sample scan — unnest WITH ORDINALITY +
# per-sample timestamps + range trim (database_utils.py:88-111: sample
# time = observation_datetime + ordinality/sampling_rate; the range
# filter over-fetches one row-length early then trims per-sample)
_Q94_ORACLE = f"""
WITH samples AS (
  SELECT ((k0 * 1000000) // 100) + ((j * 1000000) // 100) AS sample_us,
         round(100 * sin(2 * pi() * (k0 + j) / 100.0), 6) AS v
  FROM (SELECT (i * 5) AS k0 FROM range(200) t(i)), range(5) s(j)
)
SELECT 'T00E^T00E BY02^BY02-00' AS source_location,
       {_EPOCH_2024} + sample_us AS sample_us,
       CAST(round(v * 1000000) AS BIGINT) AS value_micro
FROM samples
WHERE sample_us >= 2000000 AND sample_us < 4000000
"""


@register(
    "q94_waveform_sample_scan",
    oracle=_Q94_ORACLE,
    doc=(
        "Q3 ordered per-sample scan: posexplode(values) with ordinality "
        "timestamps and a window trim — values as exact micro-units. "
        "The message-level range pre-filter (one row-length slack) lets "
        "the parquet scan prune before the explode."
    ),
)
def q94_waveform_sample_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=1, sampling_rate=100, seconds=10)
    lo = _EPOCH_2024 + 2_000_000
    hi = _EPOCH_2024 + 4_000_000
    obs_us = F.unix_micros(F.col("observation_time").cast("timestamp"))
    # message-level pre-filter with one row-length (5 samples) slack —
    # this predicate reaches the scan BEFORE the explode
    pre = msgs.filter((obs_us >= lo - 50_000) & (obs_us < hi))
    s = pre.select(
        "source_location",
        obs_us.alias("obs_us"),
        F.col("sampling_rate").alias("rate"),
        F.posexplode("values").alias("pos", "v"),
    ).select(
        "source_location",
        (F.col("obs_us") + (F.col("pos") * 1_000_000 / F.col("rate")).cast("long")).alias(
            "sample_us"
        ),
        F.round(F.col("v") * 1_000_000).cast("long").alias("value_micro"),
    )
    return s.filter((F.col("sample_us") >= lo) & (F.col("sample_us") < hi))


# Q4: stream integrity — units/rate consistency + coverage vs expected
# sample budget (st_integrity.py shape; get_waveform_coverage
# database_utils.py:114-137)
_Q95_ORACLE = f"""
WITH msgs AS (
  SELECT (i % 2) AS patient, (i // 2) AS msg_idx
  FROM range(2 * 100) t(i)
)
SELECT printf('T%02dE^T%02dE BY02^BY02-%02d', patient, patient, patient)
         AS source_location,
       1 AS n_units,
       1 AS n_rates,
       (count(*) * 5)::BIGINT AS n_samples,
       500::BIGINT AS expected_samples,
       TRUE AS units_consistent,
       TRUE AS fully_covered
FROM msgs GROUP BY patient
"""


def waveform_integrity(
    msgs: DataFrame, window_start: str, window_end: str
) -> DataFrame:
    """Q4 integrity over a REQUESTED monitoring window: expected_samples
    is rate x window span (get_waveform_coverage compares against the
    query window, not the observed message span — a stream that loses
    its head or tail messages must NOT shrink its own expectation)."""
    span_us = F.unix_micros(F.lit(window_end).cast("timestamp")) - F.unix_micros(
        F.lit(window_start).cast("timestamp")
    )
    in_window = msgs.filter(
        (F.col("observation_time") >= F.lit(window_start).cast("timestamp_ntz"))
        & (F.col("observation_time") < F.lit(window_end).cast("timestamp_ntz"))
    )
    per = in_window.groupBy("source_location").agg(
        F.countDistinct("unit").cast("int").alias("n_units"),
        F.countDistinct("sampling_rate").cast("int").alias("n_rates"),
        F.sum(F.size("values")).alias("n_samples"),
        (span_us * F.first("sampling_rate") / 1_000_000)
        .cast("long")
        .alias("expected_samples"),
    )
    return per.select(
        "source_location",
        "n_units",
        "n_rates",
        "n_samples",
        "expected_samples",
        (F.col("n_units") == 1).alias("units_consistent"),
        (F.col("n_samples") >= F.col("expected_samples")).alias("fully_covered"),
    )


@register(
    "q95_waveform_integrity_check",
    oracle=_Q95_ORACLE,
    doc=(
        "Q4 integrity: per-stream unit/rate cardinality + sample "
        "coverage against the REQUESTED window's sample budget "
        "(st_integrity.py / get_waveform_coverage)."
    ),
)
def q95_waveform_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = waveform_stream(spark, n_patients=2, sampling_rate=50, seconds=10)
    return waveform_integrity(
        msgs, "2024-01-01 00:00:00", "2024-01-01 00:00:10"
    )


# S11 waveform HL7 text parse: 12 two-OBR messages, every validation
# branch exercised (see synthetic_waveform_hl7); every 4th message's
# second OBR mismatches PV1-3 -> its 3 OBX rows reject
_Q97_ORACLE = """
SELECT * FROM (VALUES
  ('ok',                     30, 105),
  ('location mismatch',       9,   0),
  ('multiple OBX-5 repeats',  9,   0),
  ('unknown stream',         12,   0),
  ('unusable metadata',      12,   0)
) t(status, n_rows, n_samples)
ORDER BY status
"""


@register(
    "q97_waveform_hl7_parse",
    oracle=_Q97_ORACLE,
    doc=(
        "S10/S11 waveform HL7 parse (Hl7ParseAndQueue.java:49-135): "
        "OBR-grouped OBX attachment via one posexplode + running count, "
        "broadcast stream-metadata join, and the reference's full "
        "validation set routed to the dead-letter column."
    ),
)
def q97_waveform_hl7_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.sources.waveform_hl7 import (
        stream_metadata,
        synthetic_waveform_hl7,
        waveform_from_hl7,
    )

    out = waveform_from_hl7(synthetic_waveform_hl7(spark, 12), stream_metadata(spark))
    return (
        out.groupBy(F.coalesce(F.col("rejected"), F.lit("ok")).alias("status"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_rows"),
            F.sum(
                F.when(F.col("rejected").isNull(), F.size("values")).otherwise(0)
            )
            .cast("int")
            .alias("n_samples"),
        )
        .orderBy("status")
    )
