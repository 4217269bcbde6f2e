"""Rows-only driver entries: HL7 text parsing (S3-S5) and multimodal
binary-column operators. Deterministic generated input; not
SQL-expressible over the driver's parquet views."""

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


@register(
    "q75_hl7_parse_route",
    doc=(
        "S3-S5: raw pipe-delimited HL7 -> typed ADT interchange rows, all "
        "JVM-side (split/transform/filter column expressions, no UDF)."
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
        "valid_from",
    )


@register(
    "q76_media_metadata",
    doc="Multimodal: typed-metadata rollup over binary media columns.",
)
def q76_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(synthetic_media(spark, n=120))


@register(
    "q77_media_decode_features",
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
            F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + F.abs(x)), 4).alias(
                "feature_l1"
            ),
        )
    )


@register(
    "q78_video_frame_plan",
    doc="Multimodal: frame-sampling plan (explode) for video rows.",
)
def q78_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, n=30)
    return frame_sample(media, every_ms=5000).groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"), F.max("frame_ms").alias("last_frame_ms")
    )


@register(
    "q79_labs_pipeline",
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


@register(
    "q80_flowsheets_pipeline",
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


@register(
    "q81_identity_merge_closure",
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


@register(
    "q82_location_metadata_scd",
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


@register(
    "q83_pending_transfer_match",
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


@register(
    "q84_consults_and_questions",
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


@register(
    "q85_stream_windowed_rollup",
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


@register(
    "q86_oru_vendor_observations",
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


@register(
    "q87_forms_pipeline",
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


@register(
    "q88_stream_dedupe_within_watermark",
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
