"""Q8 validation lane: field_match_report branch coverage with planted
defects, and the engine-level validate() composition (the reference's
acceptance flow: replay a window, compare against an independent
extract — emap-setup validation_runner.py:98-109, validation.md:56-64)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from emap_spark.app import EmapEngine
from emap_spark.plans.validation import field_match_report, validation_run
from emap_spark.sources.generators import adt_messages


def _report(df):
    return {r.field: r for r in df.collect()}


def test_field_match_report_planted_defects(spark):
    """Every comparison branch exercised by a hand-built pair of
    extracts: presence both directions, exact equality, null==null,
    timestamp tolerance inside/on/over the bound, rel_tol inside/over."""
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(seconds):
        return t0 + datetime.timedelta(seconds=seconds)

    ours = spark.createDataFrame(
        [
            # k1: everything matches exactly
            Row(k="k1", name="a", num=10.0, when=ts(0)),
            # k2: null==null (name), rel_tol inside (1 + 5e-7)
            Row(k="k2", name=None, num=1.0, when=ts(0)),
            # k3: name mismatch, timestamp 59 s off (inside 60 s tol)
            Row(k="k3", name="x", num=2.0, when=ts(0)),
            # k4: timestamp exactly 60 s off (boundary counts as match),
            #     num exactly 0 vs 0 (denominator floor path)
            Row(k="k4", name="d", num=0.0, when=ts(0)),
            # k5: timestamp 61 s off (beyond), rel_tol beyond (x1.5)
            Row(k="k5", name="e", num=4.0, when=ts(0)),
            # k6: only in ours
            Row(k="k6", name="f", num=5.0, when=ts(0)),
            # k7: ours has null timestamp vs ref real (no tolerance match)
            Row(k="k7", name="g", num=6.0, when=None),
        ]
    )
    ref = spark.createDataFrame(
        [
            Row(k="k1", name="a", num=10.0, when=ts(0)),
            Row(k="k2", name=None, num=1.0000005, when=ts(0)),
            Row(k="k3", name="y", num=2.0, when=ts(59)),
            Row(k="k4", name="d", num=0.0, when=ts(60)),
            Row(k="k5", name="e", num=6.0, when=ts(61)),
            Row(k="k7", name="g", num=6.0, when=ts(0)),
            # k8: only in ref
            Row(k="k8", name="h", num=7.0, when=ts(0)),
        ]
    )
    rep = _report(
        field_match_report(
            ours,
            ref,
            ["k"],
            tolerances={"when": 60},
            rel_tol={"num": 1e-6},
        )
    )
    rows = rep["__rows__"]
    assert rows.n_compared == 8  # keys on either side (k1..k8)
    assert rows.n_match == 6  # k1..k5, k7 on both sides
    assert rows.match_pct == pytest.approx(75.0)

    name = rep["name"]
    assert (name.n_compared, name.n_match) == (6, 5)  # k3 mismatches

    num = rep["num"]
    # k1 exact, k2 inside rel_tol, k3 exact, k4 0==0, k7 exact; k5 beyond
    assert (num.n_compared, num.n_match) == (6, 5)

    when = rep["when"]
    # k1 exact, k3 59 s, k4 boundary 60 s; k5 61 s, k7 null-vs-real fail
    assert (when.n_compared, when.n_match) == (6, 4)
    assert when.match_pct == pytest.approx(400.0 / 6.0)


def test_field_match_report_requires_ref_columns(spark):
    ours = spark.createDataFrame([Row(k="a", x=1)])
    ref = spark.createDataFrame([Row(k="a")])
    with pytest.raises(ValueError, match="lacks columns"):
        field_match_report(ours, ref, ["k"])


def test_engine_validate_composition(spark):
    """EmapEngine.validate replays the window and emits the per-field
    report against an independent extract with planted defects."""
    adt = adt_messages(spark, n_patients=8)

    # the "independent reference extract": a first engine's final truth,
    # minus one visit, with one admission time nudged inside tolerance
    # and one pushed beyond it
    base = EmapEngine()
    base.process_batch(adt, 0)
    truth = base.table("hospital_visit").select(
        "encounter", "admission_datetime", "discharge_datetime"
    )
    ref = (
        truth.filter(F.col("encounter") != "ENC00000")
        .withColumn(
            "admission_datetime",
            F.when(
                F.col("encounter") == "ENC00001",
                F.col("admission_datetime") + F.expr("INTERVAL 30 SECONDS"),
            )
            .when(
                F.col("encounter") == "ENC00002",
                F.col("admission_datetime") + F.expr("INTERVAL 600 SECONDS"),
            )
            .otherwise(F.col("admission_datetime")),
        )
    )

    eng = EmapEngine()
    run, match = eng.validate(
        adt,
        "2024-01-01 00:00:00",
        "2025-01-01 00:00:00",
        ref,
        keys=["encounter"],
        tolerances={"admission_datetime": 60, "discharge_datetime": 60},
        n_batches=2,
    )
    assert run.n_messages == adt.count()
    assert run.n_batches == 2
    assert run.days_per_day > 1.0

    rep = _report(match)
    n = truth.count()
    rows = rep["__rows__"]
    assert rows.n_compared == n  # ref is a subset: union of keys = ours
    assert rows.n_match == n - 1  # ENC00000 absent from ref
    adm = rep["admission_datetime"]
    assert (adm.n_compared, adm.n_match) == (n - 1, n - 2)  # ENC00002 beyond
    dis = rep["discharge_datetime"]
    assert (dis.n_compared, dis.n_match) == (n - 1, n - 1)


def test_validation_run_days_per_day(spark):
    """validation_run reports the reference's days-per-day measure and
    processes every message exactly once across the window batches."""
    adt = adt_messages(spark, n_patients=4)
    eng = EmapEngine()
    report = validation_run(
        eng, adt, "2024-01-01 00:00:00", "2024-01-08 00:00:00", n_batches=3
    )
    in_window = adt.filter(
        (F.col("valid_from") >= F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("valid_from") < F.lit("2024-01-08 00:00:00").cast("timestamp_ntz"))
    ).count()
    assert report.n_messages == in_window
    assert report.n_batches == 3
    assert report.data_days == pytest.approx(7.0)
