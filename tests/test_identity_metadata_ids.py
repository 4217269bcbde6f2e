"""Tests for D2/D18 identity closure, D17 metadata SCD, and the S1
incremental IDS reader."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from emap_spark.domains.location_metadata import (
    process_department_metadata,
    state_history,
)
from emap_spark.operators.identity import mrn_to_live, propagate_opt_out, resolve_identity
from emap_spark.sources.ids import IdsReader


def test_identity_chain_closure(spark):
    # a->b, b->c, d->c : everyone lands on c
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "c")], "retired string, survivor string"
    )
    out = {r.mrn: r.live_mrn for r in resolve_identity(edges).collect()}
    assert out == {"a": "c", "b": "c", "c": "c", "d": "c"}


def test_identity_cycle_canonicalizes_to_min_member(spark):
    """Mutual merges (a<->b) have no survivor; the whole component must
    resolve to its smallest member so the identity group shares one live
    MRN (opt-out propagation / mrn_to_live splitting fix)."""
    edges = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("z", "b"), ("p", "q"), ("q", "r")],
        "retired string, survivor string",
    )
    out = {r.mrn: r.live_mrn for r in resolve_identity(edges).collect()}
    # cycle component {a, b, z} -> min "a"; acyclic chain keeps survivor
    assert out["a"] == "a" and out["b"] == "a" and out["z"] == "a"
    assert out["p"] == "r" and out["q"] == "r" and out["r"] == "r"


def test_mrn_to_live_and_opt_out(spark):
    mrns = spark.createDataFrame(
        [("a", False), ("b", False), ("c", True), ("x", False)],
        "mrn string, research_opt_out boolean",
    )
    merges = spark.createDataFrame([("a", "b")], "retired_mrn string, mrn string")
    tl = mrn_to_live(mrns.select("mrn"), merges)
    live = {r.mrn: r.live_mrn for r in tl.collect()}
    assert live == {"a": "b", "b": "b", "c": "c", "x": "x"}
    # D18: opt-out propagates across the merged set, not to others
    out = {r.mrn: r.research_opt_out for r in propagate_opt_out(mrns, tl).collect()}
    assert out == {"a": False, "b": False, "c": True, "x": False}

    merges2 = spark.createDataFrame(
        [("a", "b"), ("c", "b")], "retired_mrn string, mrn string"
    )
    tl2 = mrn_to_live(mrns.select("mrn"), merges2)
    out2 = {r.mrn: r.research_opt_out for r in propagate_opt_out(mrns, tl2).collect()}
    assert out2 == {"a": True, "b": True, "c": True, "x": False}  # c's opt-out spreads


def _dept_msgs(spark, rows):
    return spark.createDataFrame(
        rows, "department string, name string, speciality string, status string,"
        " valid_from timestamp_ntz, seq string"
    )


def test_department_scd_chain_out_of_order(spark):
    t = lambda d: datetime.datetime(2024, 1, d)
    rows = [
        ("T42", "Ward 42", "Cardio", "active", t(10), "m2"),  # arrives first but newer
        ("T42", "Ward 42", "General", "active", t(1), "m1"),
        ("T42", "Ward 42", "Cardio", "closed", t(20), "m3"),
    ]
    res = process_department_metadata(None, _dept_msgs(spark, rows), "2024-06-01 00:00:00")
    hist = sorted(state_history(res).collect(), key=lambda r: r.valid_from)
    # 3 states, contiguous, ordered by event time despite arrival order
    assert [(h.speciality, h.status) for h in hist] == [
        ("General", "active"),
        ("Cardio", "active"),
        ("Cardio", "closed"),
    ]
    assert [h.valid_until for h in hist] == [t(10), t(20), None]
    cur = res.current.collect()
    assert len(cur) == 1 and cur[0].status == "closed"


def test_department_scd_across_batches(spark):
    t = lambda d: datetime.datetime(2024, 1, d)
    b1 = _dept_msgs(spark, [("T1", "W", "A", "active", t(5), "m1")])
    b2 = _dept_msgs(spark, [("T1", "W", "B", "active", t(2), "m0")])  # older arrives later
    r1 = process_department_metadata(None, b1, "2024-06-01 00:00:00")
    r2 = process_department_metadata(r1.current, b2, "2024-06-02 00:00:00")
    hist = sorted(
        state_history(r2).collect(), key=lambda r: r.valid_from
    )
    # the late-arriving OLDER state slots in BEFORE the existing one
    assert [(h.speciality, h.valid_until) for h in hist] == [("B", t(5)), ("A", None)]


@pytest.fixture()
def ids_dir():
    d = tempfile.mkdtemp(prefix="ids_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_ids_incremental_reader(spark, ids_dir):
    log = f"{ids_dir}/log"
    rows = [(i, f"P{i}", "ADT^A01", f"MSH|...|{i}", datetime.datetime(2024, 1, 1, 0, i)) for i in range(10)]
    spark.createDataFrame(
        rows, "unid long, patient_id string, messagetype string, hl7message string,"
        " persistdatetime timestamp_ntz"
    ).write.parquet(log)

    r = IdsReader(spark, log, f"{ids_dir}/progress.json")
    df, hi = r.next_batch(max_rows=4)
    assert df.count() == 4 and hi == 3
    # crash before commit -> re-read the same slice (at-least-once)
    df2, hi2 = r.next_batch(max_rows=4)
    assert hi2 == 3
    r.commit(hi)
    df3, hi3 = r.next_batch()
    assert df3.count() == 6 and hi3 == 9
    r.commit(hi3)
    df4, hi4 = r.next_batch()
    assert df4.count() == 0 and hi4 is None


def test_hoover_windowed_polls(spark, ids_dir):
    from emap_spark.sources.hoover import HooverSource, QueryStrategy

    data = [(i, datetime.datetime(2024, 1, 1, 0, i)) for i in range(10)]
    df = spark.createDataFrame(data, "id long, updated timestamp_ntz")
    path = f"{ids_dir}/h.parquet"
    df.write.parquet(path)
    strat = QueryStrategy(
        name="flowsheets",
        load=lambda: spark.read.parquet(path),
        watermark_col="updated",
        lag_seconds=60,
    )
    src = HooverSource(f"{ids_dir}/hoover.json")
    d1, hi1 = src.poll(strat)
    assert d1.count() == 10
    src.commit(strat, hi1)
    d2, _ = src.poll(strat)
    # lag margin re-reads the final minute's row (at-least-once, no skips)
    assert d2.count() == 1


def test_forms_and_answers(spark):
    from emap_spark.domains.observations import process_forms

    rows = [
        ("f1-0", "F1", "SMOKING", "E1", "M1", "2024-05-01 10:00:00", False,
         {"smokes": "no", "packs": "0"}),
        ("f1-1", "F1", "SMOKING", "E1", "M1", "2024-05-02 10:00:00", False,
         {"smokes": "yes", "packs": '""'}),  # answer deleted via sentinel
        ("f2-0", "F2", "DIET", "E2", "M2", "2024-05-01 11:00:00", False, {"veg": "yes"}),
        ("f2-1", "F2", "DIET", "E2", "M2", "2024-05-03 11:00:00", True, None),  # form deleted
    ]
    msgs = spark.createDataFrame(
        rows,
        "seq string, form_id string, form_name string, encounter string, mrn string,"
        " valid_from string, is_delete boolean, answers map<string,string>",
    ).withColumn("valid_from", F.col("valid_from").cast("timestamp_ntz"))
    forms, answers = process_forms(None, None, msgs, "2024-06-01 00:00:00")
    live_forms = {r.form_id: r for r in forms.live().collect()}
    assert set(live_forms) == {"F1"}  # F2 deleted
    assert str(live_forms["F1"].last_filed).startswith("2024-05-02")  # newest filing wins
    ans = {(r.form_id, r.question): r.answer for r in answers.live().collect()}
    assert ans[("F1", "smokes")] == "yes"  # newer wins
    assert ans[("F1", "packs")] is None  # '""' delete sentinel
