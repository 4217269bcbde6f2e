"""S8: HL7-text factories for consults / problems / infections /
allergies — the clinical (non-ADT, non-lab) half of hl7-reader.

Reference semantics, re-expressed as column expressions (no Python UDFs;
everything stays in whole-stage codegen):

  * ORM^O01  -> ConsultRequest      (hl7-reader .../ids/ConsultFactory.java:38-86)
  * PPR^PC1-3-> PatientProblem      (.../conditons/PatientProblemFactory.java:36-99)
  * ADT^A05 + ZIF -> PatientInfection (.../conditons/PatientInfectionFactory.java:47-85)
  * ADT^A60  -> PatientAllergy      (.../conditons/PatientAllergyFactory.java:41-119)

All four feed the EXISTING domain processors (D12-D14/D16,
emap_spark/domains/observations.py) — this module closes the gap where
those domains previously started from interchange-level generated
messages only.

NTE notes follow the reference's NotesParser (hl7/parser/NotesParser.java:
42-112): a note containing the "->" separator opens a question (text
before the separator) with its answer (text after); subsequent
separator-free notes append to the open answer; notes before the first
question are free-text comments. The fold is a single F.aggregate over
the NTE array — per-message arrays are tiny, so the quadratic
last-element rewrite inside the accumulator is bounded and JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from emap_spark.sources.hl7_text import field, hl7_ts, segments
from emap_spark.functions.hl7 import tristate_from_hl7

QUESTION_SEP = "->"
# ConsultFactory.java:26-28
CANCELLATION_OCID = "OC"
AUTOMATED_FROM_DISCHARGE = "DISCHAUTO"

# PatientProblemFactory: ConditionAction.findByHl7Value over PRB-1 /
# IAM-6 action codes (interchange ConditionAction.java: AD add, UP
# update, DE delete; allergies use A/D/U/X, PatientAllergyFactory:79-93)
_DELETE_ACTIONS = ("DE", "D")


def _nte_texts(raw: Column) -> Column:
    """Ordered NTE-3 comment texts of a message."""
    ntes = F.filter(segments(raw), lambda s: s.getItem(0) == "NTE")
    return F.transform(ntes, lambda s: F.try_element_at(s, F.lit(4)))


def parse_notes(texts: Column) -> Column:
    """NotesParser fold: array<string> -> struct(questions map, comments).

    Accumulator: (qs: array<struct<q,a>>, cs: array<string>). A "->"
    note appends a new (q, a) pair; a plain note extends the LAST open
    answer, or the comments when no question is open yet."""
    acc0 = F.struct(
        F.array().cast("array<struct<q:string,a:string>>").alias("qs"),
        F.array().cast("array<string>").alias("cs"),
    )

    def step(acc: Column, x: Column) -> Column:
        has_q = x.contains(QUESTION_SEP)
        q = F.trim(F.split_part(x, F.lit(QUESTION_SEP), F.lit(1)))
        a = F.trim(F.substr(x, F.instr(x, QUESTION_SEP) + F.lit(2)))
        extend_last = F.transform(
            acc["qs"],
            lambda e, i: F.when(
                i == F.size(acc["qs"]) - 1,
                F.struct(
                    e["q"].alias("q"),
                    F.concat_ws("\n", e["a"], F.trim(x)).alias("a"),
                ),
            ).otherwise(e),
        )
        return (
            F.when(
                x.isNull() | (F.trim(x) == ""), acc
            )
            .when(
                has_q,
                F.struct(
                    F.array_append(acc["qs"], F.struct(q.alias("q"), a.alias("a"))).alias("qs"),
                    acc["cs"].alias("cs"),
                ),
            )
            .when(
                F.size(acc["qs"]) > 0,
                F.struct(extend_last.alias("qs"), acc["cs"].alias("cs")),
            )
            .otherwise(
                F.struct(
                    acc["qs"].alias("qs"),
                    F.array_append(acc["cs"], F.trim(x)).alias("cs"),
                )
            )
        )

    return F.aggregate(
        texts,
        acc0,
        step,
        lambda acc: F.struct(
            F.map_from_entries(
                F.when(F.size(acc["qs"]) > 0, acc["qs"])
            ).alias("questions"),
            F.nullif(F.array_join(acc["cs"], "\n"), F.lit("")).alias("comments"),
        ),
    )


def consults_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """ORM^O01 -> consult update rows (ConsultFactory.makeConsult:38-50).

    Columns match CONSULT_SPEC (domains/observations.py) + a questions
    map for the D16 question/answer child. Cancellation: ORC-1 == 'OC'
    means cancelled, UNLESS MSH-8 security is DISCHAUTO, which is the
    automated close-on-discharge (ConsultFactory.addCancelledOrClosed)."""
    raw = F.col(raw_col)
    trigger = F.concat_ws(
        "^", field(raw, "MSH", 9, 1), field(raw, "MSH", 9, 2)
    )
    cancelled_orc = field(raw, "ORC", 1) == CANCELLATION_OCID
    disch_auto = field(raw, "MSH", 8) == AUTOMATED_FROM_DISCHARGE
    notes = parse_notes(_nte_texts(raw))
    return df.filter(trigger == "ORM^O01").select(
        F.coalesce(field(raw, "MSH", 10), F.lit("?")).alias("source_message_id"),
        field(raw, "MSH", 3, 1).alias("source_system"),
        field(raw, "PID", 3, 1).alias("mrn"),
        field(raw, "PV1", 19, 1).alias("encounter"),
        # epicConsultId: ORC-2 placer order number (ConsultFactory:57)
        field(raw, "ORC", 2, 1).cast("long").cast("string").alias("internal_id"),
        # statusChangeDatetime: ORC-9 transaction time (:58) = event time
        hl7_ts(field(raw, "ORC", 9)).alias("valid_from"),
        hl7_ts(field(raw, "OBR", 36)).alias("scheduled_datetime"),
        field(raw, "OBR", 44).alias("consult_type"),
        (cancelled_orc & ~disch_auto).alias("cancelled"),
        (cancelled_orc & disch_auto).alias("closed_on_discharge"),
        tristate_from_hl7(notes["comments"]).alias("comments"),
        notes["questions"].alias("questions"),
    )


def _prb_groups(raw: Column) -> Column:
    """PRB segments with their trailing NTE comments (segment grouping:
    an NTE belongs to the preceding PRB, PatientProblemFactory:44-52)."""
    segs = F.filter(
        segments(raw),
        lambda s: (s.getItem(0) == "PRB") | (s.getItem(0) == "NTE"),
    )
    acc0 = F.array().cast(
        "array<struct<prb:array<string>,notes:array<string>>>"
    )

    def step(acc: Column, s: Column) -> Column:
        new_group = F.array_append(
            acc,
            F.struct(s.alias("prb"), F.array().cast("array<string>").alias("notes")),
        )
        add_note = F.transform(
            acc,
            lambda e, i: F.when(
                i == F.size(acc) - 1,
                F.struct(
                    e["prb"].alias("prb"),
                    F.array_append(e["notes"], F.try_element_at(s, F.lit(4))).alias("notes"),
                ),
            ).otherwise(e),
        )
        return (
            F.when(s.getItem(0) == "PRB", new_group)
            .when(F.size(acc) > 0, add_note)
            .otherwise(acc)
        )

    return F.aggregate(segs, acc0, step)


def problems_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """PPR^PC1/PC2/PC3 -> one CONDITION_SCHEMA-shaped row per PRB segment
    (PatientProblemFactory.buildPatientProblem:66-99)."""
    raw = F.col(raw_col)
    trigger = field(raw, "MSH", 9, 1)
    base = df.filter(trigger == "PPR").select(
        F.coalesce(field(raw, "MSH", 10), F.lit("?")).alias("source_message_id"),
        field(raw, "MSH", 3, 1).alias("source_system"),
        field(raw, "PID", 3, 1).alias("mrn"),
        field(raw, "PV1", 19, 1).alias("visit_number"),
        F.explode(_prb_groups(raw)).alias("g"),
    )
    prb = base["g"]["prb"]

    def pf(n: int, comp: int | None = None) -> Column:
        c = F.try_element_at(prb, F.lit(n + 1))
        if comp is not None:
            c = F.try_element_at(F.split(c, r"\^"), F.lit(comp))
        return c

    comment = F.nullif(
        F.array_join(F.filter(base["g"]["notes"], lambda x: x.isNotNull()), "\n"),
        F.lit(""),
    )
    return base.select(
        F.concat(
            F.col("source_message_id"), F.lit("-"), pf(4, 1)
        ).alias("source_message_id"),
        "source_system",
        "mrn",
        "visit_number",
        F.lit("PATIENT_PROBLEM").alias("condition_type"),
        pf(4, 1).alias("internal_id"),  # PRB-4 problem instance id (:88)
        hl7_ts(pf(2)).alias("valid_from"),  # PRB-2 action time (:80)
        pf(3, 1).alias("condition_code"),  # PRB-3 problem id (:82)
        tristate_from_hl7(pf(13, 1)).alias("status"),  # PRB-13 (:86)
        hl7_ts(pf(16)).cast("date").alias("onset_date"),  # PRB-16 (:91)
        hl7_ts(pf(9)).cast("date").alias("resolution_date"),  # PRB-9 (:84)
        tristate_from_hl7(comment).alias("comment"),
        tristate_from_hl7(F.lit(None).cast("string")).alias("severity"),
        F.lit(None).cast("array<string>").alias("reactions"),
        F.upper(pf(1)).isin(*_DELETE_ACTIONS).alias("is_delete"),  # PRB-1 action
    )


def infections_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """ADT^A05 + ZIF -> one row per infection repeat
    (PatientInfectionFactory.buildPatientInfection:69-85; ZIF is the
    EPIC custom segment, hl7/custom/v26/field/Infection.java: repeats of
    name^addedDatetime^resolvedDatetime). Keyed by condition code (the
    reference identifies infections by code + added time; CONDITION
    internal_id carries the code)."""
    raw = F.col(raw_col)
    trigger = F.concat_ws("^", field(raw, "MSH", 9, 1), field(raw, "MSH", 9, 2))
    has_zif = field(raw, "ZIF", 1).isNotNull()
    base = df.filter((trigger == "ADT^A05") & has_zif).select(
        F.coalesce(field(raw, "MSH", 10), F.lit("?")).alias("source_message_id"),
        field(raw, "MSH", 3, 1).alias("source_system"),
        field(raw, "PID", 3, 1).alias("mrn"),
        field(raw, "PV1", 19, 1).alias("visit_number"),
        hl7_ts(field(raw, "EVN", 2)).alias("valid_from"),  # updatedDateTime (:77)
        F.posexplode(F.split(field(raw, "ZIF", 1), "~")).alias("pos", "inf"),
    )
    comp = lambda n: F.try_element_at(F.split(base["inf"], r"\^"), F.lit(n))  # noqa: E731
    return base.filter(comp(1).isNotNull() & (comp(1) != "")).select(
        F.concat(F.col("source_message_id"), F.lit("-"), F.col("pos").cast("string")).alias(
            "source_message_id"
        ),
        "source_system",
        "mrn",
        "visit_number",
        F.lit("PATIENT_INFECTION").alias("condition_type"),
        comp(1).alias("internal_id"),
        "valid_from",
        comp(1).alias("condition_code"),
        tristate_from_hl7(F.lit(None).cast("string")).alias("status"),
        hl7_ts(comp(2)).cast("date").alias("onset_date"),  # addedDatetime (:82)
        hl7_ts(comp(3)).cast("date").alias("resolution_date"),  # (:83)
        tristate_from_hl7(F.lit(None).cast("string")).alias("comment"),
        tristate_from_hl7(F.lit(None).cast("string")).alias("severity"),
        F.lit(None).cast("array<string>").alias("reactions"),
        F.lit(False).alias("is_delete"),
    )


def allergies_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """ADT^A60 -> one row per IAM segment
    (PatientAllergyFactory.buildPatientAllergy:69-119): action IAM-6
    (A add / D delete / U,X update), allergen IAM-3 text component,
    reactions IAM-5 repeats, severity IAM-4, onset IAM-11, clinical
    status IAM-17, unique id IAM-7."""
    raw = F.col(raw_col)
    trigger = F.concat_ws("^", field(raw, "MSH", 9, 1), field(raw, "MSH", 9, 2))
    iams = F.filter(segments(raw), lambda s: s.getItem(0) == "IAM")
    base = df.filter(trigger == "ADT^A60").select(
        F.coalesce(field(raw, "MSH", 10), F.lit("?")).alias("source_message_id"),
        field(raw, "MSH", 3, 1).alias("source_system"),
        field(raw, "PID", 3, 1).alias("mrn"),
        field(raw, "PV1", 19, 1).alias("visit_number"),
        hl7_ts(field(raw, "EVN", 2)).alias("valid_from"),
        F.posexplode(iams).alias("pos", "iam"),
    )
    iamf = lambda n, c=None: (  # noqa: E731
        F.try_element_at(base["iam"], F.lit(n + 1))
        if c is None
        else F.try_element_at(
            F.split(F.try_element_at(base["iam"], F.lit(n + 1)), r"\^"), F.lit(c)
        )
    )
    action = F.upper(iamf(6, 1))
    reactions = F.filter(
        F.split(iamf(5), "~"), lambda x: x.isNotNull() & (x != "")
    )
    return base.select(
        F.concat(F.col("source_message_id"), F.lit("-"), F.col("pos").cast("string")).alias(
            "source_message_id"
        ),
        "source_system",
        "mrn",
        "visit_number",
        F.lit("PATIENT_ALLERGY").alias("condition_type"),
        iamf(7, 1).alias("internal_id"),
        "valid_from",
        iamf(3, 2).alias("condition_code"),
        tristate_from_hl7(iamf(17, 1)).alias("status"),
        hl7_ts(iamf(11)).cast("date").alias("onset_date"),
        F.lit(None).cast("date").alias("resolution_date"),
        tristate_from_hl7(F.lit(None).cast("string")).alias("comment"),
        tristate_from_hl7(iamf(4, 1)).alias("severity"),
        reactions.alias("reactions"),
        (action == "D").alias("is_delete"),
    )


def conditions_from_hl7(df: DataFrame, raw_col: str = "hl7") -> DataFrame:
    """Unified condition router: problems + infections + allergies as one
    CONDITION_SCHEMA-compatible frame ready for process_conditions (the
    reference routes all three through PatientConditionController)."""
    p = problems_from_hl7(df, raw_col)
    i = infections_from_hl7(df, raw_col)
    a = allergies_from_hl7(df, raw_col)
    return p.unionByName(i).unionByName(a)


# ---------------------------------------------------------------------------
# deterministic raw-HL7 fixtures (shaped like the reference's
# hl7-reader/src/test/resources/{ConsultRequest,PatientInfection,...})
# ---------------------------------------------------------------------------

def _seg(seg_id: str, fields: dict[int, str]) -> str:
    """Build one segment from 1-based field-number -> value."""
    width = max(fields) + 1 if fields else 1
    f = [""] * (width + 1)
    f[0] = seg_id
    for k, v in fields.items():
        f[k] = v
    return "|".join(f)


def synthetic_clinical_hl7(spark, n: int = 12) -> DataFrame:
    """n messages of EACH kind: ORM^O01 consults (every 4th cancelled,
    every 8th closed-by-discharge; NTE comment + two questions), PPR^PC1
    problems (two PRB groups, NTE comment on the first; every 3rd a
    DElete action), ADT^A05 with two ZIF infection repeats, ADT^A60 with
    two IAM allergies (second IAM is a D delete on every 4th message)."""
    rows = []
    for i in range(n):
        day = 1 + i % 25
        ts = f"202405{day:02d}10{i % 60:02d}00"
        mrn = f"CM{i:05d}"
        enc = f"CE{i:05d}"
        pid = _seg("PID", {1: "1", 3: f"{mrn}^^^MRN"})
        pv1 = _seg("PV1", {1: "1", 2: "I", 3: "T01^BY01^BED-1", 19: enc})

        # consult (ORM^O01)
        disch = i % 8 == 4
        cancel = i % 4 == 0 and not disch
        sec = AUTOMATED_FROM_DISCHARGE if disch else ""
        orc1 = CANCELLATION_OCID if (cancel or disch) else "NW"
        segs = [
            f"MSH|^~\\&|EPIC|UCLH|x|x|{ts}|{sec}|ORM^O01|CON{i:06d}|P|2.6",
            pid,
            pv1,
            _seg("ORC", {1: orc1, 2: str(1000 + i), 9: ts}),
            _seg("OBR", {1: "1", 36: ts, 44: f"CON{i % 3}^ConsultType{i % 3}"}),
            _seg("NTE", {1: "1", 3: "Progress so far"}),
            _seg("NTE", {1: "2", 3: "seen by med reg"}),
            _seg("NTE", {1: "3", 3: "Did you contact the team->no"}),
            _seg("NTE", {1: "4", 3: "Reason for consult->chest pain"}),
        ]
        rows.append((f"consult-{i}", "\r".join(segs)))

        # problems (PPR^PC1, two PRB groups)
        act = "DE" if i % 3 == 0 else ("AD" if i % 3 == 1 else "UP")
        segs = [
            f"MSH|^~\\&|EPIC|UCLH|x|x|{ts}||PPR^PC1|PRB{i:06d}|P|2.6",
            pid,
            pv1,
            _seg("PRB", {
                1: act, 2: ts, 3: "K57.32^Diverticulitis^ICD-10",
                4: f"P{i % 5}", 7: f"202301{day:02d}", 9: f"202402{day:02d}",
                13: "ACTIVE^Active", 16: f"202301{day:02d}",
            }),
            _seg("NTE", {1: "1", 3: "first problem note"}),
            _seg("PRB", {
                1: "AD", 2: ts, 3: "I10^Hypertension^ICD-10",
                4: f"P{100 + i % 5}", 7: f"202201{day:02d}", 13: "ACTIVE^Active",
            }),
        ]
        rows.append((f"problem-{i}", "\r".join(segs)))

        # infections (ADT^A05 + ZIF, two repeats)
        zif = (
            f"COVID-19^202403{day:02d}120000^"
            f"~MRSA^202402{day:02d}090000^202403{day:02d}090000"
        )
        segs = [
            f"MSH|^~\\&|EPIC|UCLH|x|x|{ts}||ADT^A05|INF{i:06d}|P|2.6",
            _seg("EVN", {1: "A05", 2: ts}),
            pid,
            pv1,
            _seg("ZIF", {1: zif}),
        ]
        rows.append((f"infection-{i}", "\r".join(segs)))

        # allergies (ADT^A60, two IAM)
        act2 = "D" if i % 4 == 0 else "A"
        segs = [
            f"MSH|^~\\&|EPIC|UCLH|x|x|{ts}||ADT^A60|ALG{i:06d}|P|2.6",
            _seg("EVN", {1: "A60", 2: ts}),
            pid,
            pv1,
            _seg("IAM", {
                1: "1", 2: "DA^Drug", 3: "PEN^Penicillin", 4: "SV^Severe",
                5: "Hives~Anaphylaxis", 6: "A^Add", 7: f"AL{i:04d}",
                11: f"202001{day:02d}", 13: ts, 17: "ACTIVE",
            }),
            _seg("IAM", {
                1: "2", 2: "FA^Food", 3: "NUT^Peanut", 4: "MO^Moderate",
                5: "Rash", 6: f"{act2}^", 7: f"AL{5000 + i:04d}",
                11: f"202002{day:02d}", 13: ts, 17: "ACTIVE",
            }),
        ]
        rows.append((f"allergy-{i}", "\r".join(segs)))
    return spark.createDataFrame(rows, "id string, hl7 string")
