"""S3-S5: minimal HL7 v2 pipe-delimited parsing as column expressions.

The reference parses HL7 with the HAPI library (hl7-reader,
IdsOperations.java:351-398) and ships a minimal splitter for the
waveform feed (waveform-reader/.../hl7parse/Hl7Segment.java,
Hl7Message.java). This module is the splitter re-expressed JVM-side:
segments split on \\r, fields on |, components on ^ — no Python UDFs,
the whole parse stays inside whole-stage codegen.

parse_hl7: raw text -> map<segment_id, array<field array>> equivalent
  (first occurrence per segment id kept as a fields array; repeated
  segments like OBX exposed via explode_segments)
adt_from_hl7: MSH-9 trigger-event routing (AdtMessageFactory.java:
  191-285 switch) -> ADT_SCHEMA-shaped rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from emap_spark.functions.hl7 import best_guess_valid_from, tristate_from_hl7

# HL7 trigger event -> interchange message type (AdtMessageFactory switch)
TRIGGER_TO_TYPE = {
    "A01": "ADMIT",
    "A02": "TRANSFER",
    "A03": "DISCHARGE",
    "A04": "REGISTER",
    "A08": "UPDATE_PATIENT_INFO",
    "A11": "CANCEL_ADMIT",
    "A12": "CANCEL_TRANSFER",
    "A13": "CANCEL_DISCHARGE",
    "A40": "MERGE",
}


def segments(raw: Column) -> Column:
    """Raw message -> array of segment field-arrays (split \\r then |)."""
    return F.transform(
        F.split(raw, "\r"),
        lambda seg: F.split(seg, r"\|"),
    )


def segment_fields(raw: Column, seg_id: str) -> Column:
    """First segment with the given id -> its fields array (1-based HL7
    numbering: fields[0] is the segment id itself)."""
    segs = F.filter(segments(raw), lambda s: s.getItem(0) == seg_id)
    return F.try_element_at(segs, F.lit(1))


def field(raw: Column, seg_id: str, n: int, component: int | None = None) -> Column:
    """SEG-n (optionally component m via ^). MSH numbering is shifted by
    one because MSH-1 is the field separator itself."""
    idx = n - 1 if seg_id == "MSH" else n
    f = F.try_element_at(segment_fields(raw, seg_id), F.lit(idx + 1))
    if component is not None:
        f = F.try_element_at(F.split(f, r"\^"), F.lit(component))
    return f


def hl7_ts(col: Column) -> Column:
    """HL7 TS at any precision (yyyyMMdd[HHmm[ss[.S...]]]) -> timestamp
    (DateTimeUtils F8); unparseable -> null like the reference's lenient
    datetime handling."""
    return F.coalesce(
        F.try_to_timestamp(F.substring(col, 1, 14), F.lit("yyyyMMddHHmmss")),
        F.try_to_timestamp(F.substring(col, 1, 12), F.lit("yyyyMMddHHmm")),
        F.try_to_timestamp(F.substring(col, 1, 8), F.lit("yyyyMMdd")),
    ).cast("timestamp_ntz")


def explode_segments(df: DataFrame, raw_col: str, seg_id: str) -> DataFrame:
    """One row per repeated segment (OBX/NTE handling, S11 shape)."""
    segs = F.filter(
        segments(F.col(raw_col)), lambda s: s.getItem(0) == seg_id
    )
    return df.withColumn("segment", F.explode(segs))


def adt_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """Route + build: one parsed ADT interchange row per raw HL7 message
    (unknown trigger events are filtered out, mirroring the factory's
    unsupported-message skip)."""
    raw = F.col(raw_col)
    trigger = field(raw, "MSH", 9, 2)
    msg_type = F.lit(None).cast("string")
    for trig, mtype in TRIGGER_TO_TYPE.items():
        msg_type = F.when(trigger == trig, F.lit(mtype)).otherwise(msg_type)

    event_occurred = hl7_ts(field(raw, "EVN", 2))
    recorded = hl7_ts(field(raw, "MSH", 7))
    return (
        df.select(
            F.coalesce(field(raw, "MSH", 10), F.lit("?")).alias("source_message_id"),
            field(raw, "MSH", 4, 1).alias("source_system"),
            best_guess_valid_from(event_occurred, recorded).alias("valid_from"),
            msg_type.alias("message_type"),
            field(raw, "PID", 3, 1).alias("mrn"),
            field(raw, "PID", 3, 4).alias("nhs_number_source"),
            field(raw, "PV1", 19, 1).alias("visit_number"),
            tristate_from_hl7(field(raw, "PV1", 2, 1)).alias("patient_class"),
            tristate_from_hl7(field(raw, "PV1", 3, 1)).alias("location"),
            tristate_from_hl7(field(raw, "PV1", 6, 1)).alias("previous_location"),
            event_occurred.alias("event_occurred"),
            recorded.alias("recorded_datetime"),
            tristate_from_hl7(field(raw, "PID", 5, 2)).alias("name_given"),
            tristate_from_hl7(field(raw, "PID", 5, 1)).alias("name_family"),
            tristate_from_hl7(field(raw, "PID", 8, 1)).alias("sex"),
            F.struct(
                hl7_ts(field(raw, "PID", 7)).alias("value"),
                F.when(field(raw, "PID", 7).isNull() | (field(raw, "PID", 7) == ""), "IGNORE")
                .otherwise("SAVE")
                .alias("status"),
            ).alias("birth_datetime"),
        )
        .filter(F.col("message_type").isNotNull())
    )


def synthetic_hl7_messages(spark, n: int = 20) -> DataFrame:
    """Deterministic raw HL7 fixtures shaped like the reference's test
    .txt resources (hl7-reader/src/test/resources/Adt)."""
    rows = []
    for i in range(n):
        mrn = f"4018{i:04d}"
        enc = f"1234{i:04d}"
        trig = ["A01", "A02", "A03", "A08"][i % 4]
        ts = f"201301{(i % 27) + 1:02d}0{(i % 9)}3000"
        pv1 = [""] * 20
        pv1[0] = "PV1"
        pv1[1] = "1"
        pv1[2] = "I"
        pv1[3] = f"T42E^T42E BY02^BY02-{i:02d}"
        pv1[6] = "T11E^T11E BY02^BY02-99"
        pv1[19] = enc  # PV1-19 visit number
        msg = "\r".join(
            [
                f"MSH|^~\\&|EPIC|UCLH|x|x|{ts}||ADT^{trig}|MSG{i:08d}|P|2.4",
                f"EVN|{trig[1:]}|{ts}",
                f"PID|1|{mrn}^^^MRN|{mrn}^^^MRN^^&NHS||Family{i}^Given{i}||19700101|F",
                "|".join(pv1),
            ]
        )
        rows.append((i, msg))
    return spark.createDataFrame(rows, "id long, hl7 string")


# ---------------------------------------------------------------------------
# S6/S7: vendor routing + ORU^R01 flowsheet/lab-result parsing
# ---------------------------------------------------------------------------

# sending-application -> vendor parse path (LabFunnel.java:34-110)
VENDOR_OF_SENDER = {
    "WinPath": "WINPATH",
    "CoPath": "CO_PATH",
    "ABL90 FLEX Plus": "ABL90_FLEX",
    "BIO-CONNECT": "BIO_CONNECT",
    "Bank Manager": "BANK_MANAGER",
    "EPIC": "EPIC_FLOWSHEET",
}


def route_vendor(raw: Column) -> Column:
    """MSH-3 sending application -> vendor tag; unknown -> null (skip)."""
    sender = field(raw, "MSH", 3, 1)
    out = F.lit(None).cast("string")
    for s, v in VENDOR_OF_SENDER.items():
        out = F.when(sender == s, F.lit(v)).otherwise(out)
    return out


def observations_from_oru(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """ORU^R01 -> one row per OBX segment (FlowsheetFactory /
    LabResultBuilder shape): value typing via OBX-2, calibration
    readings from the ABL90 path dropped (AblLabBuilder quirk —
    readings whose id starts with 'cal' are instrument calibration)."""
    from emap_spark.functions.hl7 import numeric_result, value_type_of

    raw = F.col(raw_col)
    base = df.select(
        raw.alias("__raw"),
        route_vendor(raw).alias("vendor"),
        field(raw, "MSH", 10).alias("source_message_id"),
        hl7_ts(field(raw, "MSH", 7)).alias("valid_from"),
        field(raw, "PID", 3, 1).alias("mrn"),
        field(raw, "PV1", 19, 1).alias("visit_number"),
        F.filter(
            segments(raw), lambda s: s.getItem(0) == F.lit("OBX")
        ).alias("obx_segs"),
    ).filter(F.col("vendor").isNotNull())
    obx = base.withColumn("obx", F.explode("obx_segs")).drop("obx_segs", "__raw")
    ident = F.try_element_at(F.split(F.try_element_at("obx", F.lit(4)), r"\^"), F.lit(1))
    raw_val = F.try_element_at("obx", F.lit(6))
    vtype = value_type_of(F.try_element_at("obx", F.lit(3)), raw_val)
    num = numeric_result(raw_val)
    return (
        obx.select(
            "vendor",
            "source_message_id",
            "valid_from",
            "mrn",
            "visit_number",
            ident.alias("observation_id"),
            vtype.alias("value_type"),
            F.when(vtype == "NUMERIC", num["value_as_real"]).alias("value_as_real"),
            F.when(vtype == "NUMERIC", num["result_operator"]).alias("result_operator"),
            F.when(vtype != "NUMERIC", raw_val).alias("value_as_text"),
            F.try_element_at("obx", F.lit(7)).alias("unit"),
        )
        # ABL90 calibration-reading quirk: drop instrument calibrations
        .filter(
            ~((F.col("vendor") == "ABL90_FLEX") & F.lower("observation_id").startswith("cal"))
        )
    )


def synthetic_oru_messages(spark, n: int = 12) -> DataFrame:
    """ORU^R01 fixtures across vendors, incl. ABL90 calibration rows."""
    rows = []
    senders = ["EPIC", "WinPath", "ABL90 FLEX Plus", "Unknown Vendor"]
    for i in range(n):
        sender = senders[i % 4]
        ts = f"20240301{8 + i % 12:02d}0000"
        obx = [
            f"OBX|1|NM|HR^Heart Rate||{60 + i}|bpm",
            f"OBX|2|ST|NOTE^Comment||stable {i}|",
        ]
        if sender == "ABL90 FLEX Plus":
            obx.append("OBX|3|NM|cal27^Calibration||1.0|")  # must be dropped
        msg = "\r".join(
            [
                f"MSH|^~\\&|{sender}|UCLH|x|x|{ts}||ORU^R01|ORU{i:06d}|P|2.4",
                f"PID|1||77{i:04d}^^^MRN",
                "|".join(["PV1", "1", "I"] + [""] * 16 + [f"55{i:04d}"]),
                *obx,
            ]
        )
        rows.append((i, msg))
    return spark.createDataFrame(rows, "id long, hl7 string")
