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

# HL7 trigger event -> interchange message type: the FULL
# AdtMessageFactory.buildAdtMessageSubclass switch
# (AdtMessageFactory.java:191-285). A14/A38 (scheduling) are not
# implemented in the reference either; unknown triggers are dropped.
TRIGGER_TO_TYPE = {
    "A01": "ADMIT",
    "A02": "TRANSFER",
    "A06": "TRANSFER",  # change outpatient->inpatient handled as transfer
    "A07": "TRANSFER",  # change inpatient->outpatient handled as transfer
    "A03": "DISCHARGE",
    "A04": "REGISTER",
    "A05": "IMPLIED_ADT",  # pre-admit parsed as implied/update only
    "A08": "UPDATE_PATIENT_INFO",
    "A28": "UPDATE_PATIENT_INFO",
    "A31": "UPDATE_PATIENT_INFO",
    "A11": "CANCEL_ADMIT",
    "A12": "CANCEL_TRANSFER",
    "A13": "CANCEL_DISCHARGE",
    "A15": "PENDING_TRANSFER",
    "A17": "SWAP_LOCATIONS",
    "A26": "CANCEL_PENDING_TRANSFER",
    "A29": "DELETE_PERSON",
    "A40": "MERGE",
    "A45": "MOVE_VISIT",
    "A47": "CHANGE_IDENTIFIERS",
}

CANCEL_TRIGGERS = ("A11", "A12", "A13", "A26")
MRG_TRIGGERS = ("A40", "A45", "A47")  # carry an MRG previous-identifier segment


def segments(raw: Column) -> Column:
    """Raw message -> array of segment field-arrays (split \\r then |)."""
    return F.transform(
        F.split(raw, "\r"),
        lambda seg: F.split(seg, r"\|"),
    )


def nth_segment_fields(raw: Column, seg_id: str, occurrence: int = 1) -> Column:
    """n-th segment with the given id -> its fields array (1-based HL7
    numbering: fields[0] is the segment id itself). occurrence>1 reaches
    repeated groups, e.g. the second PID/PV1 pair in an A17 swap."""
    segs = F.filter(segments(raw), lambda s: s.getItem(0) == seg_id)
    return F.try_element_at(segs, F.lit(occurrence))


def segment_fields(raw: Column, seg_id: str) -> Column:
    return nth_segment_fields(raw, seg_id, 1)


def field(
    raw: Column,
    seg_id: str,
    n: int,
    component: int | None = None,
    occurrence: int = 1,
) -> Column:
    """SEG-n (optionally component m via ^; optionally of the k-th
    repeated segment). MSH numbering is shifted by one because MSH-1 is
    the field separator itself."""
    idx = n - 1 if seg_id == "MSH" else n
    f = F.try_element_at(nth_segment_fields(raw, seg_id, occurrence), F.lit(idx + 1))
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


def tristate_ts(rawf: Column) -> Column:
    """Tri-state over an HL7 TS field: missing -> IGNORE, '\"\"' -> DELETE
    (cancellation erase), else SAVE with the parsed timestamp."""
    status = (
        F.when(rawf.isNull() | (rawf == ""), F.lit("IGNORE"))
        .when(rawf == '""', F.lit("DELETE"))
        .otherwise(F.lit("SAVE"))
    )
    return F.struct(
        F.when(status == "SAVE", hl7_ts(rawf)).alias("value"), status.alias("status")
    )


def nhs_number_from_pid3(raw: Column, occurrence: int = 1) -> Column:
    """PID-3 repetition (~) whose assigning authority (component 4) is
    NHS -> its id component (PatientIdentifierUtils in the reference's
    hl7-reader resolves MRN/NHS by authority, not position)."""
    reps = F.split(field(raw, "PID", 3, occurrence=occurrence), "~")
    nhs = F.filter(
        reps, lambda r: F.try_element_at(F.split(r, r"\^"), F.lit(4)) == "NHS"
    )
    return F.try_element_at(
        F.split(F.try_element_at(nhs, F.lit(1)), r"\^"), F.lit(1)
    )


def _adt_projection(raw: Column, occ: int) -> list:
    """Full ADT_SCHEMA projection for the occ-th PID/PV1 group (occ=2 is
    the second patient of an A17 swap; all other segments are shared)."""
    trigger = field(raw, "MSH", 9, 2)
    msg_type = F.lit(None).cast("string")
    for trig, mtype in TRIGGER_TO_TYPE.items():
        msg_type = F.when(trigger == trig, F.lit(mtype)).otherwise(msg_type)

    # EVN-6 is the time the event actually occurred; EVN-2 the recorded
    # time (AdtMessageBuilder: bestGuessAtValidFrom prefers occurred)
    event_occurred = F.coalesce(hl7_ts(field(raw, "EVN", 6)), hl7_ts(field(raw, "EVN", 2)))
    recorded = hl7_ts(field(raw, "MSH", 7))
    # A15/A26 carry the planned destination in PV1-42 (pending location)
    pend_loc = field(raw, "PV1", 42, occurrence=occ)
    cur_loc = field(raw, "PV1", 3, occurrence=occ)
    loc = F.when(
        trigger.isin("A15", "A26"),
        F.coalesce(F.nullif(pend_loc, F.lit("")), cur_loc),
    ).otherwise(cur_loc)
    msg_id = F.coalesce(field(raw, "MSH", 10), F.lit("?"))
    if occ > 1:
        msg_id = F.concat(msg_id, F.lit("-B"))
    death_raw = field(raw, "PID", 29, occurrence=occ)
    return [
        msg_id.alias("source_message_id"),
        field(raw, "MSH", 4, 1).alias("source_system"),
        best_guess_valid_from(event_occurred, recorded).alias("valid_from"),
        msg_type.alias("message_type"),
        field(raw, "PID", 3, 1, occurrence=occ).alias("mrn"),
        nhs_number_from_pid3(raw, occ).alias("nhs_number"),
        field(raw, "PV1", 19, 1, occurrence=occ).alias("visit_number"),
        tristate_from_hl7(field(raw, "PV1", 2, 1, occurrence=occ)).alias("patient_class"),
        tristate_from_hl7(loc).alias("location"),
        tristate_from_hl7(field(raw, "PV1", 6, occurrence=occ)).alias("previous_location"),
        event_occurred.alias("event_occurred"),
        recorded.alias("recorded_datetime"),
        tristate_ts(field(raw, "PV1", 44, occurrence=occ)).alias("admission_datetime"),
        tristate_ts(field(raw, "PV1", 45, occurrence=occ)).alias("discharge_datetime"),
        tristate_from_hl7(field(raw, "PV1", 36, occurrence=occ)).alias("discharge_disposition"),
        tristate_from_hl7(field(raw, "PV1", 37, 1, occurrence=occ)).alias("discharge_destination"),
        tristate_from_hl7(field(raw, "PID", 5, 2, occurrence=occ)).alias("name_given"),
        tristate_from_hl7(field(raw, "PID", 5, 1, occurrence=occ)).alias("name_family"),
        tristate_ts(field(raw, "PID", 7, occurrence=occ)).alias("birth_datetime"),
        tristate_from_hl7(field(raw, "PID", 8, 1, occurrence=occ)).alias("sex"),
        tristate_from_hl7(field(raw, "PID", 30, occurrence=occ)).alias("death_indicator"),
        tristate_ts(death_raw).alias("death_datetime"),
        field(raw, "MRG", 1, 1).alias("retired_mrn"),
        field(raw, "MRG", 5, 1).alias("retired_visit_number"),
    ]


def adt_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """Route + build: parsed ADT interchange rows per raw HL7 message
    (unknown trigger events are filtered out, mirroring the factory's
    unsupported-message skip; AdtMessageFactory.java:191-285). An A17
    swap carries two PID/PV1 groups and emits TWO rows — each patient's
    PV1-3 already holds their new location, so each row is one move."""
    raw = F.col(raw_col)
    trigger = field(raw, "MSH", 9, 2)
    first = df.select(*_adt_projection(raw, 1))
    second = df.filter(
        (trigger == "A17") & nth_segment_fields(raw, "PID", 2).isNotNull()
    ).select(*_adt_projection(raw, 2))
    return first.unionByName(second).filter(F.col("message_type").isNotNull())


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


# the reference's full ADT trigger surface, cycled by the breadth fixture
ALL_TRIGGERS = (
    "A01", "A02", "A03", "A04", "A05", "A06", "A07", "A08", "A11", "A12",
    "A13", "A15", "A17", "A26", "A28", "A29", "A31", "A40", "A45", "A47",
)


def synthetic_hl7_adt_full(spark, n: int = 40) -> DataFrame:
    """Deterministic raw-HL7 fixtures covering EVERY routed trigger event
    (shaped like hl7-reader/src/test/resources/Adt/*.txt): MRG segments on
    A40/A45/A47, pending location PV1-42 on A15/A26, two PID/PV1 groups
    on A17, death fields on A03, EVN-6 occurred times on cancels."""
    rows = []
    for i in range(n):
        trig = ALL_TRIGGERS[i % len(ALL_TRIGGERS)]
        mrn, enc = f"M{i:05d}", f"E{i:05d}"
        day, hh = 1 + i % 27, 8 + i % 10
        recorded = f"202403{day:02d}{hh:02d}0000"
        occurred = f"202403{day:02d}{hh:02d}1500"

        def pv1(mrn_i: int, extra: dict[int, str]) -> str:
            f = [""] * 46
            f[0], f[1], f[2] = "PV1", "1", "I"
            f[3] = f"T{mrn_i % 5:02d}^BY01^BED-{mrn_i % 9}"
            f[6] = f"T{(mrn_i + 1) % 5:02d}^BY02^BED-{(mrn_i + 1) % 9}"
            f[19] = f"E{mrn_i:05d}"
            for k, v in extra.items():
                f[k] = v
            return "|".join(f)

        def pid(mrn_s: str, idx: int, extra: dict[int, str]) -> str:
            f = [""] * 31
            f[0], f[1] = "PID", "1"
            f[3] = f"{mrn_s}^^^MRN~NHS{idx:07d}^^^NHS"
            f[5] = f"Fam{idx}^Giv{idx}"
            f[7] = "19800101"
            f[8] = "F" if idx % 2 == 0 else "M"
            for k, v in extra.items():
                f[k] = v
            return "|".join(f)

        pv1_extra: dict[int, str] = {}
        pid_extra: dict[int, str] = {}
        segs = [
            f"MSH|^~\\&|EPIC|UCLH|x|x|{recorded}||ADT^{trig}|FULL{i:06d}|P|2.4",
            f"EVN|{trig}|{recorded}||||{occurred}",
        ]
        if trig == "A01":
            pv1_extra[44] = occurred
        if trig == "A03":
            pv1_extra[36] = "HOME"
            pv1_extra[37] = "GP^referral"
            pv1_extra[45] = occurred
            if (i // 20) % 2 == 0:  # first A03 deceased, second not
                pid_extra[29] = occurred
                pid_extra[30] = "Y"
        if trig in ("A15", "A26"):
            pv1_extra[42] = f"T99^PEND^BED-{i % 5}"
        segs.append(pid(mrn, i, pid_extra))
        segs.append(pv1(i, pv1_extra))
        if trig in ("A40", "A47"):
            segs.append(f"MRG|OLD{i:05d}^^^MRN")
        if trig == "A45":
            segs.append(f"MRG|{mrn}^^^MRN||||OLDE{i:05d}")
        if trig == "A17":
            segs.append(pid(f"M{i:05d}B", i + 1000, {}))
            segs.append(pv1(i + 1, {}))
        rows.append((i, "\r".join(segs)))
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
    "PACS": "IMAGE_LAB",
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


# ---------------------------------------------------------------------------
# S6 deep: per-vendor lab ORDER parsing (LabFunnel routing + the five
# vendor builder families, hl7-reader/.../ids/labs/)
# ---------------------------------------------------------------------------

def _obx_structs(raw: Column, vendor: Column, obr22: Column) -> Column:
    """OBX segments -> LAB_RESULT-shaped structs, all inside one
    `transform` (no explode, no shuffle): value typing via OBX-2 with
    the vendor quirks of the result builders."""
    obx = F.filter(segments(raw), lambda s: s.getItem(0) == "OBX")
    # ABL90 calibration readings are instrument QC, dropped
    # (AblLabBuilder quirk, see observations_from_oru)
    obx = F.when(
        vendor == "ABL90_FLEX",
        F.filter(
            obx,
            lambda s: ~F.lower(
                F.try_element_at(F.split(F.try_element_at(s, F.lit(4)), r"\^"), F.lit(1))
            ).startswith("cal"),
        ),
    ).otherwise(obx)

    def build(s):
        vtype_raw = F.try_element_at(s, F.lit(3))  # OBX-2
        test_code = F.try_element_at(F.split(F.try_element_at(s, F.lit(4)), r"\^"), F.lit(1))
        sub_id = F.try_element_at(s, F.lit(5))  # OBX-4
        val = F.try_element_at(s, F.lit(6))  # OBX-5
        units = F.try_element_at(F.split(F.try_element_at(s, F.lit(7)), r"\^"), F.lit(1))
        rng = F.try_element_at(s, F.lit(8))  # OBX-7 low-high
        abn = F.try_element_at(s, F.lit(9))  # OBX-8
        t = F.coalesce(hl7_ts(F.try_element_at(s, F.lit(15))), obr22)  # OBX-14
        # ISOLATE coded (CE) values become LAB_ISOLATE results with the
        # isolate identity from OBX-4 sub-id and code^name from OBX-5
        # (WinPathResultBuilder.java:59-95)
        is_isolate = test_code == "ISOLATE"
        num = F.regexp_replace(val, r"^[<>]", "").try_cast("double")
        is_numeric = ~is_isolate & vtype_raw.isin("NM", "SN") & num.isNotNull()
        is_pdf = vtype_raw == "ED"
        vtype = (
            F.when(is_isolate, F.lit("LAB_ISOLATE"))
            .when(is_pdf, F.lit("PDF"))
            .when(is_numeric, F.lit("NUMERIC"))
            .otherwise(F.lit("TEXT"))
        )
        iso_code = F.try_element_at(F.split(val, r"\^"), F.lit(1))
        iso_name = F.try_element_at(F.split(val, r"\^"), F.lit(2))
        ignore_str = F.struct(
            F.lit(None).cast("string").alias("value"), F.lit("IGNORE").alias("status")
        )
        return F.struct(
            test_code.alias("test_code"),
            vtype.alias("value_type"),
            F.when(is_numeric, num).alias("numeric_value"),
            F.when(is_numeric & val.rlike(r"^[<>]"), F.substring(val, 1, 1))
            .when(is_numeric, F.lit("="))
            .alias("result_operator"),
            F.when(vtype == "TEXT", val).alias("string_value"),
            F.when(is_pdf, F.unbase64(val)).alias("bytes_value"),
            units.alias("units"),
            F.when(~is_isolate, F.split(rng, "-").getItem(0).try_cast("double")).alias("range_low"),
            F.when(~is_isolate, F.split(rng, "-").getItem(1).try_cast("double")).alias("range_high"),
            abn.alias("abnormal_flag"),
            t.alias("result_time"),
            F.when(
                is_isolate,
                F.struct(
                    F.coalesce(sub_id, F.lit("1")).alias("isolate_id"),
                    iso_code.alias("isolate_code"),
                    iso_name.alias("isolate_name"),
                    ignore_str.alias("culture_type"),
                    ignore_str.alias("quantity"),
                    ignore_str.alias("clinical_information"),
                    F.lit(None)
                    .cast(
                        "array<struct<agent:string,sensitivity:string,"
                        "result_time:timestamp_ntz>>"
                    )
                    .alias("sensitivities"),
                ),
            ).alias("isolate"),
        )

    return F.transform(obx, build)


def lab_orders_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """S6: vendor-routed lab ORDER parsing — one LAB_ORDER_SCHEMA-shaped
    row per message, results nested (no explode; the whole parse is one
    projection inside whole-stage codegen).

    Vendor quirks reproduced (LabFunnel.java:34-110 + builders):
    - WINPATH: ORC-2 must equal OBR-2; a mismatch marks the row
      `inconsistent` for the dead-letter path rather than parsing a
      half-trusted order (WinPathLabBuilder.java:324-335). Result time
      falls back to OBR-22 (WinPathResultBuilder.java:44-46); ISOLATE
      OBX carry isolate identity from OBX-4 (.java:59-95).
    - ABL90_FLEX (ORU^R30 point-of-care): calibration readings dropped.
    - IMAGE_LAB: TX/ST report lines are ONE logical text result — lines
      joined with newline under the first OBX identifier
      (ImageLabResultBuilder.java:122-137).
    - BANK_MANAGER / CO_PATH: shared shape; epic order number from
      ORC-2 when OBR-2 is empty (BankManagerLabBuilder).
    """
    raw = F.col(raw_col)
    vendor = route_vendor(raw)
    obr22 = hl7_ts(field(raw, "OBR", 22))
    orc2 = field(raw, "ORC", 2, 1)
    obr2 = field(raw, "OBR", 2, 1)
    epic_order = F.coalesce(F.nullif(obr2, F.lit("")), orc2)
    results = _obx_structs(raw, vendor, obr22)
    # imaging: collapse all text lines into one report result
    first = F.try_element_at(results, F.lit(1))
    joined_report = F.struct(
        first["test_code"].alias("test_code"),
        F.lit("TEXT").alias("value_type"),
        F.lit(None).cast("double").alias("numeric_value"),
        F.lit(None).cast("string").alias("result_operator"),
        F.array_join(
            F.transform(results, lambda r: r["string_value"]), "\n"
        ).alias("string_value"),
        F.lit(None).cast("binary").alias("bytes_value"),
        first["units"].alias("units"),
        F.lit(None).cast("double").alias("range_low"),
        F.lit(None).cast("double").alias("range_high"),
        first["abnormal_flag"].alias("abnormal_flag"),
        first["result_time"].alias("result_time"),
        first["isolate"].alias("isolate"),
    )
    results = F.when(
        (vendor == "IMAGE_LAB") & (F.size(results) > 0), F.array(joined_report)
    ).otherwise(results)
    inconsistent = (
        (vendor == "WINPATH")
        & orc2.isNotNull() & (orc2 != "")
        & obr2.isNotNull() & (obr2 != "")
        & (orc2 != obr2)
    )
    recorded = hl7_ts(field(raw, "MSH", 7))
    return df.select(
        F.coalesce(field(raw, "MSH", 10), F.lit("?")).alias("source_message_id"),
        field(raw, "MSH", 3, 1).alias("source_system"),
        F.coalesce(hl7_ts(field(raw, "OBR", 22)), recorded).alias("valid_from"),
        field(raw, "PID", 3, 1).alias("mrn"),
        field(raw, "PV1", 19, 1).alias("visit_number"),
        tristate_from_hl7(epic_order).alias("epic_order_number"),
        field(raw, "OBR", 3, 1).alias("external_lab_number"),
        field(raw, "OBR", 4, 1).alias("battery_code"),
        vendor.alias("coding_system"),
        tristate_ts(field(raw, "ORC", 9)).alias("order_datetime"),
        tristate_ts(field(raw, "OBR", 14)).alias("sample_received"),
        hl7_ts(field(raw, "OBR", 7)).alias("collection_datetime"),
        results.alias("results"),
        F.lit(None).cast("map<string,string>").alias("questions"),
        inconsistent.alias("inconsistent"),
    ).filter(vendor.isNotNull())


def synthetic_vendor_lab_messages(spark, n: int = 20) -> DataFrame:
    """Raw HL7 lab fixtures cycling the five vendor paths, incl. a
    WinPath ORC/OBR mismatch, ABL90 calibration rows, an ISOLATE coded
    result, and a multi-line imaging report."""
    senders = ["WinPath", "CoPath", "ABL90 FLEX Plus", "Bank Manager", "PACS"]
    rows = []
    for i in range(n):
        sender = senders[i % 5]
        day = 1 + i % 25
        ts = f"202406{day:02d}090000"
        lab_no = f"L{i:06d}"
        order_no = f"ORD{i:06d}"
        orc2 = order_no
        if sender == "WinPath" and i % 10 == 0:
            orc2 = f"BAD{i:06d}"  # inconsistency -> dead-letter
        obr = f"OBR|1|{order_no}|{lab_no}|FBC^Full Blood Count|||{ts}|||||||{ts}||||||||{ts}"
        segs = [
            f"MSH|^~\\&|{sender}|UCLH|x|x|{ts}||ORU^R01|VLAB{i:06d}|P|2.4",
            f"PID|1|{7000 + i}^^^MRN",
            "|".join(["PV1", "1", "I"] + [""] * 16 + [f"9{i:04d}"]),
            f"ORC|RE|{orc2}|{lab_no}||||||{ts}",
            obr,
        ]
        if sender == "PACS":
            segs += [
                "OBX|1|TX|REPORT^Imaging Report||Line one of report|",
                "OBX|2|TX|REPORT^Imaging Report||Line two|",
                "OBX|3|TX|REPORT^Imaging Report||Impression: normal|",
            ]
        else:
            segs.append(f"OBX|1|NM|NA^Sodium||{138 + i % 5}|mmol/L|135-145|N||||||{ts}")
            segs.append(f"OBX|2|ST|COMM^Comment||specimen ok|")
            if sender == "WinPath" and i % 5 == 0:
                segs.append("OBX|3|CE|ISOLATE^Isolate|ISO1|ECOLI^Escherichia coli|")
            if sender == "ABL90 FLEX Plus":
                segs.append("OBX|3|NM|cal09^Calibration||1.0|")
        rows.append((i, "\r".join(segs)))
    return spark.createDataFrame(rows, "id long, hl7 string")
