"""Driver entries: HL7 text parsing (S3-S5), multimodal binary-column
operators, and the domain pipelines (D7-D17). Each runs the REAL
operator on deterministic generated input; the DuckDB oracle re-derives
the same input with range() arithmetic and recomputes the expected
final state independently in SQL (same determinism rules as
waveform_ops: epoch-us timestamps, integer micro-units for float sums,
BIGINT casts where DuckDB would widen to HUGEINT)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    frame_sample,
    media_metadata,
    synthetic_media,
)
from emap_spark.registry import register
from emap_spark.sources.hl7_text import adt_from_hl7, synthetic_hl7_messages


_Q75_ORACLE = """
SELECT printf('MSG%08d', i) AS source_message_id,
       ['ADMIT','TRANSFER','DISCHARGE','UPDATE_PATIENT_INFO'][(i % 4) + 1]
         AS message_type,
       printf('4018%04d', i) AS mrn,
       printf('1234%04d', i) AS visit_number,
       'I' AS patient_class,
       printf('T42E^T42E BY02^BY02-%02d', i) AS location,
       epoch_us(make_timestamp(2013, 1, CAST(1 + (i % 27) AS INT),
                               CAST(i % 9 AS INT), 30, 0)) AS valid_from_us
FROM range(40) t(i)
"""


@register(
    "q75_hl7_parse_route",
    oracle=_Q75_ORACLE,
    doc=(
        "S3-S5: raw pipe-delimited HL7 -> typed ADT interchange rows, all "
        "JVM-side (split/transform/filter column expressions, no UDF); "
        "oracle regenerates the fixture fields arithmetically."
    ),
)
def q75_hl7_parse_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = synthetic_hl7_messages(spark, n=40)
    return adt_from_hl7(raw).select(
        "source_message_id",
        "message_type",
        "mrn",
        "visit_number",
        F.col("patient_class")["value"].alias("patient_class"),
        F.col("location")["value"].alias("location"),
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
    )


# S5 full trigger breadth: the fixture cycles all 20 routed triggers
# twice (n=40); the oracle is the expected routing table — per-type row
# counts plus MRG rekeying ids, PV1-44/45 captures, and NHS extraction.
_Q89_ORACLE = """
SELECT * FROM (VALUES
  ('ADMIT',                   2, 0, 0, 2, 0, 2),
  ('CANCEL_ADMIT',            2, 0, 0, 0, 0, 2),
  ('CANCEL_DISCHARGE',        2, 0, 0, 0, 0, 2),
  ('CANCEL_PENDING_TRANSFER', 2, 0, 0, 0, 0, 2),
  ('CANCEL_TRANSFER',         2, 0, 0, 0, 0, 2),
  ('CHANGE_IDENTIFIERS',      2, 2, 0, 0, 0, 2),
  ('DELETE_PERSON',           2, 0, 0, 0, 0, 2),
  ('DISCHARGE',               2, 0, 0, 0, 2, 2),
  ('IMPLIED_ADT',             2, 0, 0, 0, 0, 2),
  ('MERGE',                   2, 2, 0, 0, 0, 2),
  ('MOVE_VISIT',              2, 2, 2, 0, 0, 2),
  ('PENDING_TRANSFER',        2, 0, 0, 0, 0, 2),
  ('REGISTER',                2, 0, 0, 0, 0, 2),
  ('SWAP_LOCATIONS',          4, 0, 0, 0, 0, 4),
  ('TRANSFER',                6, 0, 0, 0, 0, 6),
  ('UPDATE_PATIENT_INFO',     6, 0, 0, 0, 0, 6)
) t(message_type, n, n_retired_mrn, n_retired_visit, n_admit_ts,
    n_discharge_ts, n_nhs)
ORDER BY message_type
"""


@register(
    "q89_hl7_adt_breadth",
    oracle=_Q89_ORACLE,
    doc=(
        "S5 complete trigger routing (AdtMessageFactory.java:191-285): all "
        "20 trigger events incl. MRG rekeying segments, A17 two-group swap "
        "expansion, PV1-42 pending locations, PV1-44/45 admission/discharge "
        "captures, and PID-3 NHS-authority extraction."
    ),
)
def q89_hl7_adt_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.sources.hl7_text import synthetic_hl7_adt_full

    adt = adt_from_hl7(synthetic_hl7_adt_full(spark, n=40))
    one = F.lit(1)
    return (
        adt.groupBy("message_type")
        .agg(
            F.count(one).cast("int").alias("n"),
            F.count("retired_mrn").cast("int").alias("n_retired_mrn"),
            F.count("retired_visit_number").cast("int").alias("n_retired_visit"),
            F.sum((F.col("admission_datetime")["status"] == "SAVE").cast("int"))
            .cast("int")
            .alias("n_admit_ts"),
            F.sum((F.col("discharge_datetime")["status"] == "SAVE").cast("int"))
            .cast("int")
            .alias("n_discharge_ts"),
            F.count("nhs_number").cast("int").alias("n_nhs"),
        )
        .orderBy("message_type")
    )


# synthetic media payloads are the 64 utf-8 bytes of a sha256 hex string,
# so byte lengths are constant and the metadata rollup is closed-form
_Q76_ORACLE = """
WITH m AS (
  SELECT i,
         ['image','audio','video'][(i % 3) + 1] AS kind,
         CASE WHEN i % 3 = 0 THEN 64 END AS width,
         CASE WHEN i % 3 <> 0 THEN ((i % 60) + 1) * 1000 END AS duration_ms
  FROM range(120) t(i)
)
SELECT kind, count(*)::BIGINT AS n_items,
       (count(*) * 64)::BIGINT AS total_bytes,
       max(width)::BIGINT AS max_width,
       max(duration_ms)::BIGINT AS max_duration_ms
FROM m GROUP BY kind
"""


@register(
    "q76_media_metadata",
    oracle=_Q76_ORACLE,
    doc="Multimodal: typed-metadata rollup over binary media columns.",
)
def q76_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(synthetic_media(spark, n=120)).select(
        "kind",
        "n_items",
        "total_bytes",
        F.col("max_width").cast("long").alias("max_width"),
        F.col("max_duration_ms").cast("long").alias("max_duration_ms"),
    )


# payload = utf-8 bytes of sha256-hex(id); checksum = md5(payload);
# feature[j] = float32((digest_byte[j]/255)*2-1) over sha256(payload).
# DuckDB recomputes both hashes and decodes the hex pairs; the l1 norm
# is exposed in exact integer micro-units (per-element rounding) so
# float32 quantization is bit-identical on both sides.
_Q77_ORACLE = """
WITH m AS (
  SELECT i, ['image','audio','video'][(i % 3) + 1] AS kind,
         sha256(CAST(i AS VARCHAR)) AS payload_hex
  FROM range(60) t(i)
),
d AS (SELECT i, kind, payload_hex, sha256(payload_hex) AS h2 FROM m),
terms AS (
  SELECT d.i,
         CAST(round(abs(CAST(CAST(
                 (((strpos('0123456789abcdef', substr(d.h2, j * 2 + 1, 1)) - 1) * 16
                   + strpos('0123456789abcdef', substr(d.h2, j * 2 + 2, 1)) - 1)
                  / 255.0) * 2 - 1
               AS FLOAT) AS DOUBLE)) * 1000000) AS BIGINT) AS t
  FROM d, range(8) r(j)
)
SELECT d.i AS media_id, d.kind, 64::BIGINT AS n_bytes,
       md5(d.payload_hex) AS checksum,
       s.l1 AS feature_l1_micro
FROM d JOIN (SELECT i, SUM(t)::BIGINT AS l1 FROM terms GROUP BY i) s USING (i)
"""


@register(
    "q77_media_decode_features",
    oracle=_Q77_ORACLE,
    doc=(
        "Multimodal: mapInPandas decode (stubbed codec, real Arrow "
        "plumbing) + feature extraction into array<float> for ANN."
    ),
)
def q77_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=60)
    decoded = decode_media(media)
    feats = extract_features(media, dim=8)
    return (
        decoded.join(feats, "media_id")
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "checksum",
            F.aggregate(
                "feature",
                F.lit(0).cast("long"),
                lambda a, x: a + F.round(F.abs(x.cast("double")) * 1_000_000).cast("long"),
            ).alias("feature_l1_micro"),
        )
    )


_Q78_ORACLE = """
SELECT i AS media_id,
       (((i % 60) + 1) * 1000 // 5000 + 1)::BIGINT AS n_frames,
       ((((i % 60) + 1) * 1000 // 5000) * 5000)::BIGINT AS last_frame_ms
FROM range(30) t(i) WHERE i % 3 = 2
"""


@register(
    "q78_video_frame_plan",
    oracle=_Q78_ORACLE,
    doc="Multimodal: frame-sampling plan (explode) for video rows.",
)
def q78_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=30)
    return frame_sample(media, every_ms=5000).groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ms").cast("long").alias("last_frame_ms"),
    )


# 25 orders, every 5th tombstoned by the epic delete sentinel; live
# orders carry NA (numeric, corrected to 141.5+i%5 by the newer msg),
# COMM (text, from the initial msg) and PDFR (pdf, from the update)
_Q79_ORACLE = """
WITH live AS (
  SELECT i, ['FBC','UE','LFT'][(i % 3) + 1] AS battery_code,
         141.5 + (i % 5) AS na
  FROM range(25) t(i) WHERE i % 5 <> 0
)
SELECT battery_code, v.value_type, count(*)::BIGINT AS n_results,
       CASE WHEN v.value_type = 'NUMERIC' THEN round(SUM(na), 2) END
         AS sum_numeric
FROM live, (VALUES ('NUMERIC'), ('TEXT'), ('PDF')) v(value_type)
GROUP BY battery_code, v.value_type
"""


@register(
    "q79_labs_pipeline",
    oracle=_Q79_ORACLE,
    doc=(
        "D9-D11 labs: nested LabOrderMsg explode -> sample/order/result "
        "merges incl. epic delete-sentinel tombstones and newer-wins "
        "result corrections."
    ),
)
def q79_labs_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.labs import process_lab_orders
    from emap_spark.sources.generators import lab_order_messages

    res = process_lab_orders({}, lab_order_messages(spark, n_orders=25), "2024-06-01 00:00:00")
    results = res["lab_result"].live()
    orders = res["lab_order"].live().select("external_lab_number", "battery_code", "encounter")
    return (
        results.join(orders, ["external_lab_number", "battery_code"], "left_semi")
        .groupBy("battery_code", "value_type")
        .agg(
            F.count(F.lit(1)).alias("n_results"),
            F.round(F.sum("value_as_real"), 2).alias("sum_numeric"),
        )
    )


# D11 micro: 12 culture orders, isolate updated by a follow-up report
# (quantity/clinical newer-wins), AMOX flipped R->S at 18:00, GENT keeps
# its 09:00 report time; reporting time = the sensitivity row's
# valid_from (time of last applied change)
_Q91_ORACLE = """
SELECT printf('MICRO%05d', i) AS external_lab_number,
       CASE WHEN i % 2 = 0 THEN 'ECOLI' ELSE 'SAUR' END AS isolate_code,
       '100,000+' AS quantity,
       'wound swab ' || i AS clinical_information,
       a.agent AS agent,
       'S' AS sensitivity,
       epoch_us(make_timestamp(2024, 4, CAST(1 + (i % 25) AS INT),
                CASE WHEN a.agent = 'AMOX' THEN 18 ELSE 9 END, 0, 0))
         AS reporting_us
FROM range(12) t(i), (VALUES ('AMOX'), ('GENT')) a(agent)
"""


@register(
    "q91_lab_isolate_sensitivities",
    oracle=_Q91_ORACLE,
    doc=(
        "D11 LabIsolate/LabSensitivity child tables "
        "(LabResultController.java:153-213): isolates keyed by isolate_id "
        "under their result, sensitivities keyed by agent under their "
        "isolate, newer-wins updates flip AMOX R->S and bump only its "
        "reporting time."
    ),
)
def q91_lab_isolate_sensitivities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.labs import process_lab_orders
    from emap_spark.sources.generators import micro_lab_messages

    res = process_lab_orders({}, micro_lab_messages(spark, 12), "2024-06-01 00:00:00")
    key = ["external_lab_number", "battery_code", "test_code", "isolate_id"]
    iso = res["lab_isolate"].live().select(
        *key, "isolate_code", "quantity", "clinical_information"
    )
    sens = res["lab_sensitivity"].live().select(
        *key, "agent", "sensitivity",
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("reporting_us"),
    )
    return iso.join(sens, key).select(
        "external_lab_number", "isolate_code", "quantity",
        "clinical_information", "agent", "sensitivity", "reporting_us",
    )


# D12: 15 patients x (allergy with replaced reactions, infection
# hoover-deleted for i%3==0, problem linked to 2 visits)
_Q92_ORACLE = """
SELECT * FROM (VALUES
  ('PATIENT_ALLERGY',   15,  0, 15,  0),
  ('PATIENT_INFECTION', 10,  5,  0, 15),
  ('PATIENT_PROBLEM',   15,  0,  0, 30)
) t(condition_type, n_live, n_deleted, n_reactions, n_visit_links)
ORDER BY condition_type
"""


@register(
    "q92_patient_conditions",
    oracle=_Q92_ORACLE,
    doc=(
        "D12 conditions + children (PatientConditionController.java:"
        "95-476): tombstoned hoover delete-readd, allergen-reaction "
        "REPLACE-SET (newest message's list wins wholesale), and the "
        "condition-visits link table."
    ),
)
def q92_patient_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.observations import (
        allergen_reactions_view,
        process_conditions,
    )
    from emap_spark.sources.generators import condition_messages

    res = process_conditions({}, condition_messages(spark, 15), "2024-06-01 00:00:00")
    cond = res["patient_condition"].current.groupBy("condition_type").agg(
        F.sum((~F.col("is_deleted")).cast("int")).cast("int").alias("n_live"),
        F.sum(F.col("is_deleted").cast("int")).cast("int").alias("n_deleted"),
    )
    reacts = (
        allergen_reactions_view(res["allergen_reaction"].live())
        .groupBy("condition_type")
        .agg(F.count(F.lit(1)).cast("int").alias("n_reactions"))
    )
    links = (
        res["condition_visits"].live()
        .groupBy("condition_type")
        .agg(F.count(F.lit(1)).cast("int").alias("n_visit_links"))
    )
    return (
        cond.join(reacts, "condition_type", "left")
        .join(links, "condition_type", "left")
        .select(
            "condition_type",
            "n_live",
            "n_deleted",
            F.coalesce("n_reactions", F.lit(0)).alias("n_reactions"),
            F.coalesce("n_visit_links", F.lit(0)).alias("n_visit_links"),
        )
        .orderBy("condition_type")
    )


# 60 vitals, value type and observation type both cycle with i%3 (HR
# numeric, BP text, NOTE date); all 60 keys distinct -> 20 live rows per
# type with exactly one value column populated
_Q80_ORACLE = """
SELECT ['HR','BP','NOTE'][(i % 3) + 1] AS observation_type,
       count(*)::BIGINT AS n_obs,
       SUM(CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_numeric,
       SUM(CASE WHEN i % 3 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_text,
       SUM(CASE WHEN i % 3 = 2 THEN 1 ELSE 0 END)::BIGINT AS n_date
FROM range(60) t(i)
GROUP BY observation_type
"""


@register(
    "q80_flowsheets_pipeline",
    oracle=_Q80_ORACLE,
    doc="D8 flowsheets: typed value dispatch into visit_observation.",
)
def q80_flowsheets_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.observations import process_flowsheets
    from emap_spark.sources.generators import flowsheet_messages

    res = process_flowsheets(None, flowsheet_messages(spark, n=60), "2024-06-01 00:00:00")
    return res.live().groupBy("observation_type").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count("value_as_real").alias("n_numeric"),
        F.count("value_as_text").alias("n_text"),
        F.count("value_as_date").alias("n_date"),
    )


# chains 3k+2 -> 3k+1 -> 3k partition MRN00000..38 into 13 groups of 3;
# MRN00039 is a singleton; opt-out ORs over each group (i%7==0 members)
_Q81_ORACLE = """
WITH g AS (
  SELECT (i // 3) * 3 AS live, count(*) AS n, bool_or(i % 7 = 0) AS oo
  FROM range(40) t(i) GROUP BY 1
)
SELECT printf('MRN%05d', live) AS live_mrn, oo AS research_opt_out,
       n::BIGINT AS n_members
FROM g
"""


@register(
    "q81_identity_merge_closure",
    oracle=_Q81_ORACLE,
    doc=(
        "D2/D18 via the engine: MERGE (A40) messages -> MrnToLive with "
        "chains collapsed + opt-out OR-propagation across merged sets."
    ),
)
def q81_identity_merge_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.operators.identity import mrn_to_live, propagate_opt_out

    mrns = spark.range(40).select(
        F.format_string("MRN%05d", F.col("id")).alias("mrn"),
        (F.col("id") % 7 == 0).alias("research_opt_out"),
    )
    # chain merges: 3k+1 -> 3k, 3k+2 -> 3k+1 (chains of length 3)
    merges = spark.range(13).select(
        F.format_string("MRN%05d", F.col("id") * 3 + 1).alias("retired_mrn"),
        F.format_string("MRN%05d", F.col("id") * 3).alias("mrn"),
    ).unionByName(
        spark.range(13).select(
            F.format_string("MRN%05d", F.col("id") * 3 + 2).alias("retired_mrn"),
            F.format_string("MRN%05d", F.col("id") * 3 + 1).alias("mrn"),
        )
    )
    tl = mrn_to_live(mrns.select("mrn"), merges)
    return propagate_opt_out(mrns, tl).groupBy("live_mrn", "research_opt_out").agg(
        F.count(F.lit(1)).alias("n_members")
    )


# states arrive newest-first; the chain sorted by valid_from is
# (Neuro closed @day0) -> (Cardio active @day1) -> (General active @day2,
# open-ended); valid_until = next state's valid_from
_Q82_ORACLE = """
SELECT printf('D%02d', d) AS department,
       ['Neuro','Cardio','General'][j + 1] AS speciality,
       CASE WHEN j = 0 THEN 'closed' ELSE 'active' END AS status,
       1704067200000000 + j * 86400000000 AS valid_from_us,
       CASE WHEN j < 2 THEN 1704067200000000 + (j + 1) * 86400000000 END
         AS valid_until_us
FROM range(10) t(d), range(3) s(j)
"""


@register(
    "q82_location_metadata_scd",
    oracle=_Q82_ORACLE,
    doc="D17 SCD: out-of-order department state messages -> contiguous state chains.",
)
def q82_location_metadata_scd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.location_metadata import process_department_metadata, state_history

    # 3 states per department, deliberately generated out of event order
    msgs = spark.range(30).select(
        F.format_string("D%02d", F.col("id") % 10).alias("department"),
        F.format_string("Ward %s", F.col("id") % 10).alias("name"),
        F.element_at(
            F.array(F.lit("General"), F.lit("Cardio"), F.lit("Neuro")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("speciality"),
        F.when(F.col("id") % 3 == 2, "closed").otherwise("active").alias("status"),
        F.timestamp_micros(
            F.lit(1704067200000000) + ((2 - F.col("id") % 3) * 86400_000_000)
        ).cast("timestamp_ntz").alias("valid_from"),  # reversed event order
        F.col("id").cast("string").alias("seq"),
    )
    res = process_department_metadata(None, msgs, "2024-06-01 00:00:00")
    return state_history(res).select(
        "department", "speciality", "status",
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_until").cast("timestamp")).alias("valid_until_us"),
    )


# every even-i pending gets a same-day cancel at a unique (visit,
# location, day) triple, so each cancel pairs with its own pending
_Q83_ORACLE = """
SELECT (i % 2 = 0) AS cancelled, count(*)::BIGINT AS n_movements,
       count(DISTINCT i % 4)::BIGINT AS n_visits
FROM range(12) t(i) GROUP BY 1
"""


@register(
    "q83_pending_transfer_match",
    oracle=_Q83_ORACLE,
    doc="D7: A15 pending transfers matched to A26 cancels by rank pairing.",
)
def q83_pending_transfer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.pending import match_pending_movements

    rows = []
    for i in range(12):
        rows.append((f"p{i}", "PENDING_TRANSFER", f"V{i % 4}",
                     f"2024-01-{1 + i % 9:02d} 10:00:00", f"WARD-{i % 3}"))
        if i % 2 == 0:  # half the pendings later cancelled
            rows.append((f"c{i}", "CANCEL_PENDING_TRANSFER", f"V{i % 4}",
                         f"2024-01-{1 + i % 9:02d} 12:00:00", f"WARD-{i % 3}"))
    df = spark.createDataFrame(
        rows,
        "source_message_id string, message_type string, visit_number string,"
        " valid_from string, loc string",
    ).select(
        "source_message_id", "message_type", "visit_number",
        F.col("valid_from").cast("timestamp_ntz").alias("valid_from"),
        F.struct(F.col("loc").alias("value"), F.lit("SAVE").alias("status")).alias("location"),
    )
    return match_pending_movements(df).groupBy("cancelled").agg(
        F.count(F.lit(1)).alias("n_movements"),
        F.count_distinct(F.col("visit_number")).alias("n_visits"),
    )


# 15 consults; every 3rd cancelled by a newer message (cancelled=true
# wins); each initial message contributes 2 parsed question-answers
_Q84_ORACLE = """
SELECT 'ICU_REVIEW' AS consult_type, v.c AS cancelled,
       v.n::BIGINT AS n_consults, v.a::BIGINT AS n_answers
FROM (VALUES (TRUE, 5, 10), (FALSE, 10, 20)) v(c, n, a)
"""


@register(
    "q84_consults_and_questions",
    oracle=_Q84_ORACLE,
    doc=(
        "D13/D16: consult-request upsert by internal id (cancel/close "
        "flags newer-wins) + question-answer dimension rows (D16 "
        "RequestAnswer per (question, parent))."
    ),
)
def q84_consults_and_questions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.observations import process_consults
    from emap_spark.functions.hl7 import parse_questions

    rows = []
    for i in range(15):
        t0 = f"2024-04-{1 + i % 9:02d} 09:00:00"
        rows.append((f"co-{i}-0", i, f"ENC{i % 5:05d}", "ICU_REVIEW", t0, False, False,
                     f"urgency->high\nreason->sepsis {i}"))
        if i % 3 == 0:  # later cancelled
            t1 = f"2024-04-{1 + i % 9:02d} 17:00:00"
            rows.append((f"co-{i}-1", i, f"ENC{i % 5:05d}", "ICU_REVIEW", t1, True, False, None))
    df = spark.createDataFrame(
        rows,
        "seq string, internal_id long, encounter string, consult_type string,"
        " valid_from string, cancelled boolean, closed_on_discharge boolean, notes string",
    ).select(
        "seq", "internal_id", "encounter", "consult_type",
        F.col("valid_from").cast("timestamp_ntz").alias("valid_from"),
        F.col("valid_from").cast("timestamp_ntz").alias("scheduled_datetime"),
        "cancelled", "closed_on_discharge",
        F.struct(F.col("notes").alias("value"),
                 F.when(F.col("notes").isNotNull(), "SAVE").otherwise("IGNORE").alias("status")
                 ).alias("comments"),
        parse_questions(F.coalesce(F.col("notes"), F.lit(""))).alias("questions"),
    )
    res = process_consults(None, df, "2024-06-01 00:00:00")
    answers = df.select("internal_id", F.explode_outer("questions").alias("question", "answer"))
    return (
        res.live()
        .join(answers, "internal_id", "left")
        .groupBy("consult_type", "cancelled")
        .agg(
            F.count_distinct("internal_id").alias("n_consults"),
            F.count("question").alias("n_answers"),
        )
    )


# the STREAM plumbing (watermark, window state, availableNow sink) is
# the operator under test; the final aggregate itself is day-bucket
# counts, which DuckDB recomputes directly over the same table
_Q85_ORACLE = """
SELECT epoch_us(date_trunc('day', ts)) AS window_start_us, event_type,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


@register(
    "q85_stream_windowed_rollup",
    oracle=_Q85_ORACLE,
    doc=(
        "Structured Streaming windowed aggregation with watermark over the "
        "events table (readStream -> window(1h) -> availableNow sink), the "
        "Spark-native form of the reference's streaming rollups."
    ),
)
def q85_stream_windowed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from emap_spark.sources.tables import load_table

    # stage a ts-normalized copy (the raw file is nanos-precision, which
    # the file-stream source can't read with a normalized schema)
    batch = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    stage = tempfile.mkdtemp(prefix="q85_events_")
    batch.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(batch.schema).parquet(stage)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "q85_out_" + stage.rsplit("_", 1)[-1]  # unique per invocation
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table(name)
    return out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n",
    )


# senders cycle EPIC/WinPath/ABL90/Unknown; Unknown is filtered by the
# vendor router and ABL90 calibration OBX rows are dropped, leaving one
# NM + one ST observation per kept message
_Q86_ORACLE = """
WITH base AS (
  SELECT i, ['EPIC_FLOWSHEET','WINPATH','ABL90_FLEX'][(i % 4) + 1] AS vendor
  FROM range(24) t(i) WHERE i % 4 < 3
)
SELECT vendor, v.vt AS value_type, count(*)::BIGINT AS n_obs,
       CASE WHEN v.vt = 'NUMERIC'
            THEN round(SUM(CAST(60 + i AS DOUBLE)), 2) END AS sum_numeric
FROM base, (VALUES ('NUMERIC'), ('TEXT')) v(vt)
GROUP BY vendor, v.vt
"""


@register(
    "q86_oru_vendor_observations",
    oracle=_Q86_ORACLE,
    doc=(
        "S6/S7: per-vendor ORU^R01 routing (LabFunnel) + OBX explode with "
        "value typing; ABL90 calibration readings dropped."
    ),
)
def q86_oru_vendor_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.sources.hl7_text import observations_from_oru, synthetic_oru_messages

    obs = observations_from_oru(synthetic_oru_messages(spark, n=24))
    return obs.groupBy("vendor", "value_type").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.sum("value_as_real"), 2).alias("sum_numeric"),
    )


# every 4th form tombstoned (all even, SMOKING); live SMOKING forms keep
# only q1 (q2 hit the '""' delete sentinel), DIET forms keep q1+q2
_Q87_ORACLE = """
SELECT v.name AS form_name, v.f::BIGINT AS n_forms,
       v.a::BIGINT AS n_live_answers
FROM (VALUES ('SMOKING', 5, 5), ('DIET', 10, 20)) v(name, f, a)
"""


@register(
    "q87_forms_pipeline",
    oracle=_Q87_ORACLE,
    doc=(
        "D15/D16: Form upsert (delete tombstones) + FormAnswer child rows "
        "from exploded answer maps with '\"\"' delete sentinels."
    ),
)
def q87_forms_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.observations import process_forms

    rows = []
    for i in range(20):
        ans = {"q1": f"v{i}", "q2": "0" if i % 2 else '""'}
        rows.append((f"fm-{i}-0", f"FORM{i:03d}", ["SMOKING", "DIET"][i % 2],
                     f"E{i % 6}", f"M{i % 6}", f"2024-05-{1 + i % 25:02d} 10:00:00", False, ans))
        if i % 4 == 0:
            rows.append((f"fm-{i}-1", f"FORM{i:03d}", ["SMOKING", "DIET"][i % 2],
                         f"E{i % 6}", f"M{i % 6}", f"2024-05-{1 + i % 25:02d} 18:00:00", True, None))
    msgs = spark.createDataFrame(
        rows,
        "seq string, form_id string, form_name string, encounter string, mrn string,"
        " valid_from string, is_delete boolean, answers map<string,string>",
    ).withColumn("valid_from", F.col("valid_from").cast("timestamp_ntz"))
    forms, answers = process_forms(None, None, msgs, "2024-06-01 00:00:00")
    return (
        forms.live()
        .join(answers.live(), "form_id", "left")
        .groupBy("form_name")
        .agg(
            F.count_distinct("form_id").alias("n_forms"),
            F.count("answer").alias("n_live_answers"),
        )
    )


# duplicate deliveries are injected by doubling the 500-row prefix; the
# deduped per-type counts equal the plain counts over that prefix
_Q88_ORACLE = """
WITH sel AS (SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 500)
SELECT event_type, count(*)::BIGINT AS n_after_dedupe FROM sel GROUP BY event_type
"""


@register(
    "q88_stream_dedupe_within_watermark",
    oracle=_Q88_ORACLE,
    doc=(
        "W4 streaming form: dropDuplicatesWithinWatermark over a stream "
        "with injected duplicate deliveries — the Structured Streaming "
        "native at-least-once guard (state bounded by the watermark, "
        "unlike the batch dropDuplicates which keys forever)."
    ),
)
def q88_stream_dedupe_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from emap_spark.sources.tables import load_table

    base = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .orderBy("event_id")  # deterministic subset (event_id is unique)
        .limit(500)
    )
    doubled = base.unionByName(base)  # every message delivered twice
    stage = tempfile.mkdtemp(prefix="q88_events_")
    doubled.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(doubled.schema).parquet(stage)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_after_dedupe"))
    )
    name = "q88_out_" + stage.rsplit("_", 1)[-1]
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).select("event_type", "n_after_dedupe")


# S6 vendor lab parse: 20 messages cycling 5 vendor paths; WinPath has
# 2 ORC/OBR-mismatched orders (dead-letter) and carries ISOLATE coded
# results; ABL90 drops its calibration OBX; imaging joins 3 TX lines
# into one report result
_Q96_ORACLE = """
SELECT * FROM (VALUES
  ('ABL90_FLEX',   4, 0, 8, 4, 4, 0),
  ('BANK_MANAGER', 4, 0, 8, 4, 4, 0),
  ('CO_PATH',      4, 0, 8, 4, 4, 0),
  ('IMAGE_LAB',    4, 0, 4, 0, 4, 0),
  ('WINPATH',      2, 2, 6, 2, 2, 2)
) t(coding_system, n_orders, n_inconsistent, n_results, n_numeric,
    n_text, n_isolate)
ORDER BY coding_system
"""


@register(
    "q96_hl7_lab_vendor_parse",
    oracle=_Q96_ORACLE,
    doc=(
        "S6 per-vendor lab parsing (LabFunnel.java:34-110 + the five "
        "builder families): ORC/OBR consistency dead-lettering, ABL90 "
        "calibration drop, imaging TX-line joining, ISOLATE coded "
        "results — all as one JVM-side projection, results nested "
        "without an explode."
    ),
)
def q96_hl7_lab_vendor_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.sources.hl7_text import (
        lab_orders_from_hl7,
        synthetic_vendor_lab_messages,
    )

    out = lab_orders_from_hl7(synthetic_vendor_lab_messages(spark, 20))
    r = out.select(
        "coding_system",
        "inconsistent",
        F.explode_outer("results").alias("res"),
    )
    return (
        out.groupBy("coding_system")
        .agg(
            F.sum((~F.col("inconsistent")).cast("int")).cast("int").alias("n_orders"),
            F.sum(F.col("inconsistent").cast("int")).cast("int").alias("n_inconsistent"),
        )
        .join(
            r.filter(~F.col("inconsistent"))
            .groupBy("coding_system")
            .agg(
                F.count("res").cast("int").alias("n_results"),
                F.sum((F.col("res")["value_type"] == "NUMERIC").cast("int"))
                .cast("int")
                .alias("n_numeric"),
                F.sum((F.col("res")["value_type"] == "TEXT").cast("int"))
                .cast("int")
                .alias("n_text"),
                F.sum((F.col("res")["value_type"] == "LAB_ISOLATE").cast("int"))
                .cast("int")
                .alias("n_isolate"),
            ),
            "coding_system",
        )
        .orderBy("coding_system")
    )


# D14: 12 decisions, follow-up updates; i%3==0 cancelled, i%4==0 closed
# on discharge; requestedDatetime keeps the 09:00 first value while
# statusChange moves to 15:00
_Q98_ORACLE = """
SELECT printf('AD%05d', i) AS internal_id,
       CASE WHEN i % 2 = 0 THEN 'DNACPR' ELSE 'NOT_FOR_ESCALATION' END
         AS advance_decision_type,
       (i % 3 = 0) AS cancelled,
       (i % 4 = 0) AS closed_due_to_discharge,
       epoch_us(make_timestamp(2024, 7, CAST(1 + (i % 25) AS INT), 9, 0, 0))
         AS requested_us,
       epoch_us(make_timestamp(2024, 7, CAST(1 + (i % 25) AS INT), 15, 0, 0))
         AS status_change_us
FROM range(12) t(i)
"""


@register(
    "q98_advance_decisions",
    oracle=_Q98_ORACLE,
    doc=(
        "D14 advance decisions (informdb/decisions/AdvanceDecision.java:"
        "28-86): dedicated table keyed by EPIC internal id — newer-wins "
        "cancellation/closure flags, first-recorded requestedDatetime."
    ),
)
def q98_advance_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.observations import process_advance_decisions
    from emap_spark.sources.generators import advance_decision_messages

    msgs = advance_decision_messages(spark, 12).select(
        "*", F.col("source_message_id").alias("seq")
    )
    res = process_advance_decisions(None, msgs, "2024-06-01 00:00:00")
    return res.live().select(
        "internal_id",
        "advance_decision_type",
        "cancelled",
        "closed_due_to_discharge",
        F.unix_micros(F.col("requested_datetime").cast("timestamp")).alias("requested_us"),
        F.unix_micros(F.col("status_change_datetime").cast("timestamp")).alias(
            "status_change_us"
        ),
    )


# Metadata dims: 20 flowsheet types (every 4th renamed at t1) + 10 lab
# tests (2 providers) + 6 consult types; version counts prove the SCD
# chain records the renames
_Q99_ORACLE = """
SELECT * FROM (VALUES
  ('consultation_type',       6,  6, 0),
  ('lab_test_definition',    10, 10, 0),
  ('visit_observation_type', 20, 25, 5)
) t(dim, n_current, n_versions, n_renamed)
ORDER BY dim
"""


@register(
    "q99_metadata_dimensions",
    oracle=_Q99_ORACLE,
    doc=(
        "Metadata dimension feeds (FlowsheetMetadata / LabMetadataMsg / "
        "ConsultMetadata): broadcast-sized dims with SCD rename history "
        "via the versions merge."
    ),
)
def q99_metadata_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    from emap_spark.domains.metadata import process_metadata

    t0 = datetime.datetime(2024, 8, 1, 9, 0, 0)
    t1 = datetime.datetime(2024, 8, 2, 9, 0, 0)
    fs = [
        {"interface_id": f"FLO{i:04d}", "name": f"flow {i}",
         "display_name": f"Flow {i}", "value_type": "NUMERIC", "unit": "bpm",
         "creation_datetime": t0, "valid_from": t0, "seq": f"m{i}"}
        for i in range(20)
    ] + [
        {"interface_id": f"FLO{i:04d}", "name": f"flow {i} renamed",
         "display_name": f"Flow {i}", "value_type": "NUMERIC", "unit": "bpm",
         "creation_datetime": t1, "valid_from": t1, "seq": f"r{i}"}
        for i in range(0, 20, 4)
    ]
    fs_df = spark.createDataFrame(
        fs,
        "interface_id string, name string, display_name string, value_type string,"
        " unit string, creation_datetime timestamp_ntz, valid_from timestamp_ntz,"
        " seq string",
    )
    labs = spark.createDataFrame(
        [
            {"lab_provider": "WINPATH" if i % 2 == 0 else "CO_PATH",
             "test_lab_code": f"T{i:03d}", "name": f"test {i}",
             "lab_department": "HAEM", "valid_from": t0, "seq": f"l{i}"}
            for i in range(10)
        ],
        "lab_provider string, test_lab_code string, name string,"
        " lab_department string, valid_from timestamp_ntz, seq string",
    )
    cons = spark.createDataFrame(
        [
            {"code": f"CON{i}", "name": f"consult {i}", "valid_from": t0,
             "seq": f"c{i}"}
            for i in range(6)
        ],
        "code string, name string, valid_from timestamp_ntz, seq string",
    )
    rows = []
    for dim, msgs in [
        ("visit_observation_type", fs_df),
        ("lab_test_definition", labs),
        ("consultation_type", cons),
    ]:
        res = process_metadata(dim, None, msgs, "2024-06-01 00:00:00")
        cur = res.current
        audit = res.audit
        n_current = cur.count()
        n_versions = n_current + audit.count()
        renamed = cur.filter(F.col("name").endswith("renamed")).count() if "name" in cur.columns else 0
        rows.append((dim, int(n_current), int(n_versions), int(renamed)))
    return spark.createDataFrame(rows, "dim string, n_current int, n_versions int, n_renamed int").orderBy("dim")


# S1/S9/W6: incremental source polling — IDS unid-slice polls with
# budget + appends between polls, and hoover time-window polls with a
# re-read lag; watermarks advance exactly as the closed form predicts
_Q100_ORACLE = """
SELECT * FROM (VALUES
  ('ids',    1, 25, 24),
  ('ids',    2, 25, 49),
  ('ids',    3, 20, 69),
  ('hoover', 1, 40, 39),
  ('hoover', 2, 40, 59)
) t(source, poll, n_rows, watermark)
ORDER BY source, poll
"""


@register(
    "q100_incremental_polling",
    oracle=_Q100_ORACLE,
    doc=(
        "S1 IDS polling (IdsOperations.getNextHL7IdsRecord: unid-slice "
        "reads, ack-then-advance progress) and S9 hoover time-window "
        "polls (watermark column + lag re-read margin): three IDS polls "
        "with a 25-row budget over a log appended mid-stream, and two "
        "hoover polls where the 20 s lag re-reads the boundary rows."
    ),
)
def q100_incremental_polling(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import shutil
    import tempfile

    from emap_spark.sources.hoover import HooverSource, QueryStrategy
    from emap_spark.sources.ids import IdsReader

    work = tempfile.mkdtemp(prefix="poll_oracle_")
    rows = []
    try:
        # --- IDS: 60-row log, 25-row budget, 10 rows appended after poll 1
        def ids_rows(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("unid"),
                F.format_string("P%03d", F.col("id")).alias("patient_id"),
                F.lit("ADT^A01").alias("messagetype"),
                F.lit("MSH|...").alias("hl7message"),
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias(
                    "persistdatetime"
                ),
            )

        log = f"{work}/ids_log"
        ids_rows(0, 60).write.mode("append").parquet(log)
        reader = IdsReader(spark, log, f"{work}/ids_progress.json")
        for poll in (1, 2, 3):
            df, wm = reader.next_batch(max_rows=25)
            rows.append(("ids", poll, df.count(), int(wm)))
            reader.commit(wm)
            if poll == 1:
                ids_rows(60, 70).write.mode("append").parquet(log)

        # --- hoover: 40 rows at t0..t39s; 20 more appended; lag=20s means
        # poll 2 re-reads from watermark(39s)-20s -> rows t20..t59 = 40
        base = datetime.datetime(2024, 3, 1)

        def hoover_rows(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("row_id"),
                (
                    F.lit(base) + F.make_interval(secs=F.col("id").cast("double"))
                ).cast("timestamp_ntz").alias("updated_at"),
            )

        hv = f"{work}/hoover_tbl"
        hoover_rows(0, 40).write.mode("append").parquet(hv)
        src = HooverSource(f"{work}/hoover_progress.json")
        strat = QueryStrategy(
            name="labs",
            load=lambda: spark.read.parquet(hv),
            watermark_col="updated_at",
            lag_seconds=20,
        )
        for poll in (1, 2):
            df, hi = src.poll(strat)
            wm_s = int(
                (datetime.datetime.fromisoformat(str(hi)) - base).total_seconds()
            )
            rows.append(("hoover", poll, df.count(), wm_s))
            src.commit(strat, hi)
            if poll == 1:
                hoover_rows(40, 60).write.mode("append").parquet(hv)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "source string, poll int, n_rows int, watermark int"
    ).orderBy("source", "poll")


# --------------------------------------------------------------------------
# q102: REAL builtin media decode — WAV via stdlib wave + numpy PCM, PPM
# via numpy. This closes the "codec step is stubbed" gap for the formats
# the container can express; compressed formats keep the documented
# NotImplementedError swap point.
#
# Fixture arithmetic (synthetic_real_media, n=40): even ids = WAV with
# 800*(i%10+1) frames (for even i, (i%10)+1 cycles 1,3,5,7,9, four times
# each -> total 800*25*4 = 80000 samples; max file = 44 + 2*7200 bytes);
# odd ids = 32x24 PPM (768 pixels each; file = 13 + 2304 bytes).
_Q102_ORACLE = """
SELECT * FROM (VALUES
  ('audio', 20, 80000, 14444),
  ('image', 20, 15360,  2317)
) t(kind, n_items, total_units, max_bytes)
ORDER BY kind
"""


@register(
    "q102_media_builtin_decode",
    oracle=_Q102_ORACLE,
    doc=(
        "REAL media decode (no external libs): WAV PCM parsed with the "
        "stdlib wave module + numpy, binary PPM parsed with numpy, both "
        "inside the Arrow-batched mapInPandas plumbing; unit counts and "
        "byte sizes verified against the file formats' closed forms."
    ),
)
def q102_media_builtin_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.multimodal.binary_ops import decode_media, synthetic_real_media

    decoded = decode_media(synthetic_real_media(spark, 40), codec="builtin")
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_items"),
            F.sum("pixels_or_samples").cast("int").alias("total_units"),
            F.max("n_bytes").cast("int").alias("max_bytes"),
        )
        .orderBy("kind")
    )


# --------------------------------------------------------------------------
# q110: REAL image resize (multimodal resize op from the north star)
# --------------------------------------------------------------------------
# fixture closed form: odd ids are 32x24 constant-color PPMs with every
# channel == (i*7)%256, so an 8x6 nearest-neighbor resize keeps the mean
# exactly and the PPM re-encode is header(11B for 'P6\n8 6\n255\n') +
# 8*6*3 raster bytes = 155
_Q110_ORACLE = """
SELECT i::BIGINT AS media_id,
       32 AS src_w, 24 AS src_h, 8 AS out_w, 6 AS out_h,
       155::BIGINT AS out_bytes,
       ((i * 7) % 256)::DOUBLE AS mean_value
FROM range(40) t(i)
WHERE i % 2 = 1
"""


@register(
    "q110_media_resize",
    oracle=_Q110_ORACLE,
    doc=(
        "REAL nearest-neighbor image resize (multimodal/binary_ops."
        "resize_images): decode the PPM raster, numpy index-grid "
        "resample, re-encode — Arrow-batched mapInPandas, one image "
        "batch per worker. The fixture's constant-color images give the "
        "oracle a closed form (mean preserved, output size exact); the "
        "resample plumbing itself is the real pipeline."
    ),
)
def q110_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.multimodal.binary_ops import (
        resize_images,
        synthetic_real_media,
    )

    media = synthetic_real_media(spark, n=40)
    return resize_images(media, out_w=8, out_h=6).select(
        "media_id", "src_w", "src_h", "out_w", "out_h", "out_bytes", "mean_value"
    )


# --------------------------------------------------------------------------
# q124: REAL audio feature extraction (framing / peak / zero-crossings)
# --------------------------------------------------------------------------
# fixture closed form (multimodal/binary_ops.synthetic_real_media): even
# ids are 16-bit mono 8 kHz WAVs of a 1 kHz sine with amplitude 1000+i
# and exactly 800*((i%10)+1) frames. The sine's period is 8 samples with
# zeros at half-periods, so the (pcm >= 0) sign sequence flips twice per
# period -> nf/4 - 1 transitions over nf samples; the peak sample is
# exactly the amplitude (sin(pi/2) rounds to 1.0); 160-sample framing
# (20 ms at 8 kHz) gives nf/160 whole frames. Every feature is integer-
# exact, so the DuckDB oracle needs no trig at all.
_Q124_ORACLE = """
SELECT i::BIGINT AS media_id,
       (800 * ((i % 10) + 1))::BIGINT AS n_samples,
       (800 * ((i % 10) + 1) // 160)::BIGINT AS n_frames,
       (1000 + i)::BIGINT AS peak_abs,
       (800 * ((i % 10) + 1) // 4 - 1)::BIGINT AS zero_crossings,
       (800 * ((i % 10) + 1) // 8)::BIGINT AS duration_ms
FROM range(40) t(i) WHERE i % 2 = 0
"""


@register(
    "q124_audio_features",
    oracle=_Q124_ORACLE,
    doc=(
        "REAL audio DSP over decoded PCM (multimodal/binary_ops."
        "audio_features): stdlib-wave parse + numpy framing, peak, and "
        "zero-crossing count inside Arrow-batched mapInPandas. The "
        "fixture sines give every feature an integer-exact closed form, "
        "so the oracle verifies the actual decode+DSP path bit-for-bit."
    ),
)
def q124_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.multimodal.binary_ops import (
        audio_features,
        synthetic_real_media,
    )

    return audio_features(synthetic_real_media(spark, n=40))
