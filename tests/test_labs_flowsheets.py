"""D8-D11 domain tests, modeled on TestLabOrderProcessing /
TestVisitObservationProcessing scenarios."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from emap_spark.domains.labs import process_lab_orders
from emap_spark.domains.observations import process_flowsheets
from emap_spark.sources.generators import flowsheet_messages, lab_order_messages


def test_labs_explode_and_upsert(spark):
    msgs = lab_order_messages(spark, n_orders=10)
    res = process_lab_orders({}, msgs, "2024-06-01 00:00:00")

    samples = res["lab_sample"].live().collect()
    assert len(samples) == 10  # one sample row per external lab number

    orders = res["lab_order"].live().collect()
    # every 5th order deleted via epic sentinel -> 8 live orders
    assert len(orders) == 8
    assert all(o.epic_order_number is not None for o in orders)

    results = {(r.external_lab_number, r.test_code): r for r in res["lab_result"].live().collect()}
    # order 1: NA corrected by the newer message, COMM kept, PDF added
    na = results[("LAB000001", "NA")]
    assert na.value_as_real == 142.5  # newer wins (141.5 + 1)
    assert str(na.result_last_modified).endswith("15:00:00")
    comm = results[("LAB000001", "COMM")]
    assert comm.value_as_text == "note 1"
    pdf = results[("LAB000001", "PDFR")]
    assert pdf.value_as_bytes == bytes([1]) * 4 and pdf.value_as_real is None


def test_labs_delete_keeps_sample_and_audit(spark):
    msgs = lab_order_messages(spark, n_orders=5)
    res = process_lab_orders({}, msgs, "2024-06-01 00:00:00")
    # LAB000000 deleted: order gone, sample remains
    live_orders = [r.external_lab_number for r in res["lab_order"].live().collect()]
    assert "LAB000000" not in live_orders
    samples = [r.external_lab_number for r in res["lab_sample"].live().collect()]
    assert "LAB000000" in samples

    # delete arriving in a LATER batch audits the superseded order version
    creates = msgs.filter(~F.col("source_message_id").endswith("-2"))
    deletes = msgs.filter(F.col("source_message_id").endswith("-2"))
    step1 = process_lab_orders({}, creates, "2024-06-01 00:00:00")
    step2 = process_lab_orders(
        {k: v.current for k, v in step1.items()}, deletes, "2024-06-02 00:00:00"
    )
    assert "LAB000000" not in [
        r.external_lab_number for r in step2["lab_order"].live().collect()
    ]
    audit = step2["lab_order"].audit.filter(
        F.col("external_lab_number") == "LAB000000"
    ).collect()
    assert len(audit) >= 1 and audit[0].epic_order_number == "EPIC000000"


def test_labs_batch_split_invariance(spark):
    msgs = lab_order_messages(spark, n_orders=6)
    one = process_lab_orders({}, msgs, "2024-06-01 00:00:00")

    first = msgs.filter(F.col("source_message_id").endswith("-0"))
    rest = msgs.filter(~F.col("source_message_id").endswith("-0"))
    step1 = process_lab_orders({}, rest, "2024-06-01 00:00:00")  # updates FIRST
    cur = {k: v.current for k, v in step1.items()}
    step2 = process_lab_orders(cur, first, "2024-06-02 00:00:00")

    def snap(res):
        return sorted(
            (r.external_lab_number, r.test_code, r.value_as_real, r.value_as_text)
            for r in res["lab_result"].live().collect()
        )

    assert snap(one) == snap(step2)


def test_flowsheet_typed_dispatch(spark):
    msgs = flowsheet_messages(spark, n=9)
    res = process_flowsheets(None, msgs, "2024-06-01 00:00:00")
    rows = res.live().collect()
    assert len(rows) == 9
    by_type = {}
    for r in rows:
        by_type.setdefault(r.observation_type, []).append(r)
    assert all(r.value_as_real is not None and r.value_as_text is None for r in by_type["HR"])
    assert all(r.value_as_text is not None for r in by_type["BP"])  # TEXT slot
    assert all(r.value_as_date is not None for r in by_type["NOTE"])  # DATE slot
    hr = by_type["HR"][0]
    assert hr.unit == "bpm"


def test_flowsheet_newer_wins_same_key(spark):
    import copy

    base = flowsheet_messages(spark, n=3).collect()[0].asDict(recursive=True)
    m1 = copy.deepcopy(base)
    m2 = copy.deepcopy(base)
    m2["source_message_id"] = "fs-corr"
    m2["valid_from"] = base["valid_from"] + datetime.timedelta(hours=2)
    m2["numeric_value"] = {"value": 99.0, "status": "SAVE"}
    from emap_spark.schemas.interchange import FLOWSHEET_SCHEMA

    msgs = spark.createDataFrame([m1, m2], FLOWSHEET_SCHEMA)
    res = process_flowsheets(None, msgs, "2024-06-01 00:00:00")
    rows = res.live().collect()
    assert len(rows) == 1 and rows[0].value_as_real == 99.0


def test_pending_transfer_closest_match(spark):
    from emap_spark.domains.pending import match_pending_movements

    rows = [
        ("p1", "PENDING_TRANSFER", "V1", "2024-01-01 10:00:00", "W1"),
        ("p2", "PENDING_TRANSFER", "V1", "2024-01-01 11:00:00", "W1"),
        ("c1", "CANCEL_PENDING_TRANSFER", "V1", "2024-01-01 10:30:00", "W1"),
    ]
    df = spark.createDataFrame(
        rows,
        "source_message_id string, message_type string, visit_number string,"
        " valid_from string, loc string",
    ).select(
        "source_message_id", "message_type", "visit_number",
        F.col("valid_from").cast("timestamp_ntz").alias("valid_from"),
        F.struct(F.col("loc").alias("value"), F.lit("SAVE").alias("status")).alias("location"),
    )
    out = sorted(
        match_pending_movements(df).collect(), key=lambda r: r.event_datetime
    )
    # the first pending (closest prior to the cancel) is the cancelled one
    assert [(str(r.event_datetime), r.cancelled) for r in out] == [
        ("2024-01-01 10:00:00", True),
        ("2024-01-01 11:00:00", False),
    ]


def test_lab_isolates_and_sensitivities(spark):
    """D11 (LabResultController.java:153-213): isolates keyed by
    isolate_id under their result; sensitivities keyed by agent; the
    follow-up report updates isolate info newer-wins and flips AMOX
    R->S while GENT keeps its original reporting time."""
    from emap_spark.domains.labs import process_lab_orders
    from emap_spark.sources.generators import micro_lab_messages

    msgs = micro_lab_messages(spark, n_orders=4)
    # batch-split + reversed arrival must converge identically
    b_initial = msgs.filter(F.col("source_message_id").endswith("-0"))
    b_update = msgs.filter(F.col("source_message_id").endswith("-1"))

    def final(batches):
        cur: dict = {}
        for k, b in enumerate(batches):
            res = process_lab_orders(cur, b, f"2024-06-01 00:00:0{k}")
            cur = {name: r.current for name, r in res.items()}
        iso = sorted(
            (r.external_lab_number, r.isolate_code, r.quantity, r.clinical_information)
            for r in res["lab_isolate"].live().collect()
        )
        sens = sorted(
            (r.external_lab_number, r.agent, r.sensitivity, str(r.valid_from))
            for r in res["lab_sensitivity"].live().collect()
        )
        return iso, sens

    iso, sens = final([b_initial, b_update])
    assert final([b_update, b_initial]) == (iso, sens) == final([msgs])
    assert all(q == "100,000+" and c.startswith("wound swab") for _, _, q, c in iso)
    by_agent = {(l, a): (s, t) for l, a, s, t in sens}
    assert by_agent[("MICRO00000", "AMOX")][0] == "S"
    assert by_agent[("MICRO00000", "GENT")][0] == "S"
    # AMOX reporting bumped to the follow-up; GENT keeps the original
    assert by_agent[("MICRO00000", "AMOX")][1] > by_agent[("MICRO00000", "GENT")][1]


def test_condition_children_permutation(spark):
    """D12: reaction REPLACE-SET and visit links converge under any
    arrival order; hoover delete tombstones the infection but keeps
    its audit trail."""
    import itertools

    from emap_spark.domains.observations import (
        allergen_reactions_view,
        process_conditions,
    )
    from emap_spark.sources.generators import condition_messages

    msgs = condition_messages(spark, n=3)
    splits = [
        msgs.filter(F.col("source_message_id").endswith("-0")),
        msgs.filter(~F.col("source_message_id").endswith("-0")),
    ]

    def final(batches):
        cur: dict = {}
        for k, b in enumerate(batches):
            res = process_conditions(cur, b, f"2024-06-01 00:00:0{k}")
            cur = {name: r.current for name, r in res.items()}
        conds = sorted(
            (r.condition_type, r.internal_id, r.is_deleted, str(r.status))
            for r in res["patient_condition"].current.collect()
        )
        reacts = sorted(
            (r.internal_id, r.reaction)
            for r in allergen_reactions_view(
                res["allergen_reaction"].live()
            ).collect()
        )
        links = sorted(
            (r.internal_id, r.encounter)
            for r in res["condition_visits"].live().collect()
        )
        return conds, reacts, links

    base = final([msgs])
    assert final(splits) == final(list(reversed(splits))) == base
    conds, reacts, links = base
    # replaced set: only 'rash' survives per allergy
    assert reacts == [(f"ALG{i}", "rash") for i in range(3)]
    # INF0 deleted (i%3==0), INF1/INF2 live
    deleted = {c[1] for c in conds if c[2]}
    assert deleted == {"INF0"}
    # each problem linked to both visits
    assert [l for l in links if l[0] == "PRB1"] == [
        ("PRB1", "ENC00001A"), ("PRB1", "ENC00001B")
    ]
