"""Parse-side scalar function tests (SURVEY §2.2 F1-F12), modeled on the
reference's golden-file parse tests (§5.1) in miniature."""

from __future__ import annotations

from pyspark.sql import functions as F

from emap_spark.functions.hl7 import (
    best_guess_valid_from,
    decompose_location,
    format_source_id,
    numeric_result,
    parse_questions,
    reference_range,
    tristate_from_hl7,
    value_type_of,
)


def one(spark, col):
    return spark.range(1).select(col.alias("r")).collect()[0].r


def test_tristate_from_hl7(spark):
    df = spark.createDataFrame(
        [("val",), ('""',), ("",), (None,)], "x string"
    ).select(tristate_from_hl7(F.col("x")).alias("t"))
    rows = [(r.t.value, r.t.status) for r in df.collect()]
    assert rows == [
        ("val", "SAVE"),
        (None, "DELETE"),
        (None, "IGNORE"),
        (None, "IGNORE"),
    ]


def test_numeric_result_comparator(spark):
    df = spark.createDataFrame([("<5.5",), (">100",), ("42",)], "x string").select(
        numeric_result(F.col("x")).alias("r")
    )
    rows = [(r.r.result_operator, r.r.value_as_real) for r in df.collect()]
    assert rows == [("<", 5.5), (">", 100.0), ("=", 42.0)]


def test_reference_range(spark):
    df = spark.createDataFrame([("3.5-7.2",), ("<10",), (">2",)], "x string").select(
        reference_range(F.col("x")).alias("r")
    )
    rows = [(r.r.range_low, r.r.range_high) for r in df.collect()]
    assert rows == [(3.5, 7.2), (None, 10.0), (2.0, None)]


def test_value_type_inference(spark):
    df = spark.createDataFrame(
        [("NM", "5.0"), ("ST", "hello"), ("ST", "<7"), ("ED", "pdf")],
        "t string, v string",
    ).select(value_type_of(F.col("t"), F.col("v")).alias("vt"))
    assert [r.vt for r in df.collect()] == ["NUMERIC", "TEXT", "NUMERIC", "ED"]


def test_parse_questions(spark):
    blob = "Q1->A1\nnot a question\nQ2->part1->part2"
    m = one(spark, parse_questions(F.lit(blob)))
    assert m == {"Q1": "A1", "Q2": "part1->part2"}


def test_decompose_location(spark):
    r = one(spark, decompose_location(F.lit("T42E^T42E BY02^BY02-17")))
    assert (r.department, r.room, r.bed) == ("T42E", "T42E BY02", "BY02-17")


def test_valid_from_fallback(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "2024-01-01 11:00:00"), (None, "2024-01-01 11:00:00")],
        "a string, b string",
    ).select(
        best_guess_valid_from(
            F.col("a").cast("timestamp_ntz"), F.col("b").cast("timestamp_ntz")
        ).alias("t")
    )
    assert [str(r.t) for r in df.collect()] == [
        "2024-01-01 10:00:00",
        "2024-01-01 11:00:00",
    ]


def test_format_source_id(spark):
    assert one(spark, format_source_id(F.lit(42))) == "0000000042"
