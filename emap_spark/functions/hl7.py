"""Parse-side scalar functions (SURVEY.md §2.2, F1-F12) as pure column
expressions — everything stays in whole-stage codegen; no UDFs.

Each helper cites the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tristate_from_hl7(col: Column) -> Column:
    """F1: HL7 optional-field semantics (InterchangeValue.buildFromHl7,
    emap-interchange/.../InterchangeValue.java:100-107):
    null/'' -> IGNORE, '\"\"' -> DELETE, else SAVE."""
    status = (
        F.when(col.isNull() | (col == ""), F.lit("IGNORE"))
        .when(col == '""', F.lit("DELETE"))
        .otherwise(F.lit("SAVE"))
    )
    value = F.when(status == "SAVE", col)
    return F.struct(value.alias("value"), status.alias("status"))


def numeric_result(col: Column) -> Column:
    """F2: leading </> comparator split into result_operator, remainder
    parsed as double; '=' default (LabResultBuilder.java:212-223)."""
    op = F.when(col.rlike(r"^[<>]"), F.substring(col, 1, 1)).otherwise(F.lit("="))
    num = F.regexp_replace(col, r"^[<>]", "").try_cast("double")
    return F.struct(op.alias("result_operator"), num.alias("value_as_real"))


def reference_range(col: Column) -> Column:
    """F3: 'low-high' range split; '<x' upper-only; '>x' lower-only
    (LabResultBuilder.java:123-143)."""
    low = (
        F.when(col.rlike(r"^<"), F.lit(None).cast("double"))
        .when(col.rlike(r"^>"), F.regexp_replace(col, r"^>", "").try_cast("double"))
        .otherwise(F.split(col, "-").getItem(0).try_cast("double"))
    )
    high = (
        F.when(col.rlike(r"^>"), F.lit(None).cast("double"))
        .when(col.rlike(r"^<"), F.regexp_replace(col, r"^<", "").try_cast("double"))
        .otherwise(F.split(col, "-").getItem(1).try_cast("double"))
    )
    return F.struct(low.alias("range_low"), high.alias("range_high"))


def value_type_of(obx2: Column, raw: Column) -> Column:
    """F4: OBX-2 in {ST,FT,TX,NM} -> NUMERIC if the value parses as a
    number else TEXT (LabResultBuilder.java:38,170-186)."""
    numeric_ok = F.regexp_replace(raw, r"^[<>]", "").try_cast("double").isNotNull()
    return (
        F.when(obx2.isin("ST", "FT", "TX", "NM") & numeric_ok, F.lit("NUMERIC"))
        .when(obx2.isin("ST", "FT", "TX", "NM"), F.lit("TEXT"))
        .otherwise(obx2)
    )


def join_repeats(col: Column) -> Column:
    """F5: OBX-5 repeats / NTE notes joined with newline
    (LabResultBuilder.java:195-206)."""
    return F.array_join(col, "\n")


def parse_questions(col: Column, sep: str = "->") -> Column:
    """F6: NTE blob -> question->answer map (NotesParser.java:42-96).
    Lines without the separator are dropped; multi-part answers (extra
    separator occurrences) are re-joined into the answer."""
    lines = F.split(col, "\n")
    kept = F.filter(lines, lambda l: F.instr(l, sep) > 0)
    pairs = F.transform(
        kept,
        lambda l: F.struct(
            F.trim(F.split(l, sep).getItem(0)).alias("key"),
            F.trim(F.array_join(F.slice(F.split(l, sep), 2, 100), sep)).alias("value"),
        ),
    )
    return F.map_from_entries(pairs)


def decompose_location(col: Column) -> Column:
    """F7: 'dept^room^bed' decomposition (LocationController.java:73-90;
    fixture A01.yaml:19)."""
    parts = F.split(col, r"\^")
    return F.struct(
        parts.getItem(0).alias("department"),
        parts.getItem(1).alias("room"),
        parts.getItem(2).alias("bed"),
    )


def best_guess_valid_from(event_occurred: Column, recorded: Column) -> Column:
    """F8: validFrom fallback chain eventOccurred ?? recorded
    (AdtMessage.bestGuessAtValidFrom, adt/AdtMessage.java:50-55)."""
    return F.coalesce(event_occurred, recorded)


def format_source_id(unid: Column) -> Column:
    """F12: zero-padded %010d sourceMessageId (IdsOperations.java:421)."""
    return F.format_string("%010d", unid)


def death_info_consistent(death_indicator: Column, death_datetime: Column) -> Column:
    """F11: A03 death-flag vs death-time cross-validation
    (AdtMessageFactory.java:124-158): a death time without the indicator
    set (or indicator 'Y' with absurd time ordering) is flagged."""
    has_time = death_datetime.isNotNull()
    says_dead = death_indicator == "Y"
    return (says_dead & has_time) | (~says_dead & ~has_time) | (says_dead & ~has_time)
