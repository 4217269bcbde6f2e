"""One engine, whole user surface: EmapEngine maintains the D12/D13/D16
clinical tables through the same durable pipeline machinery as the
ADT star tables — a user of the reference feeds interchange messages of
any type and reads any table from the one engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emap_spark.app import EmapEngine
from emap_spark.domains.observations import process_conditions
from emap_spark.sources.generators import condition_messages
from emap_spark.sources.hl7_clinical import consults_from_hl7, synthetic_clinical_hl7


def test_condition_tables_match_direct_processors(spark, tmp_path):
    msgs = condition_messages(spark, 12)
    eng = EmapEngine(storage_root=str(tmp_path / "c"))
    eng.process_condition_batch(msgs, 0)

    direct = process_conditions({}, msgs, "2024-06-01 00:00:00")

    def snap(df, cols):
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    key = ["mrn", "condition_type", "internal_id"]
    assert snap(eng.table("patient_condition"), key + ["status"]) == snap(
        direct["patient_condition"].live().select(key + ["status", "onset_date"]),
        key + ["status"],
    )
    assert snap(eng.table("condition_visits"), key + ["encounter"]) == snap(
        direct["condition_visits"].live(), key + ["encounter"]
    )
    # reactions replace-set agrees (exploded live counts)
    n_eng = eng.table("allergen_reaction").select(F.explode("reactions")).count()
    n_dir = direct["allergen_reaction"].live().select(F.explode("reactions")).count()
    assert n_eng == n_dir > 0


def test_consults_from_hl7_through_engine_with_restart(spark, tmp_path):
    raw = synthetic_clinical_hl7(spark, 8)
    consults = consults_from_hl7(raw)
    root = str(tmp_path / "k")

    e1 = EmapEngine(storage_root=root)
    e1.process_consult_batch(consults.filter(F.col("internal_id") < "1004"), 0)
    del e1

    e2 = EmapEngine(storage_root=root)
    e2.load(spark)
    e2.process_consult_batch(consults.filter(F.col("internal_id") >= "1004"), 1)
    # replayed batch is a no-op
    n_q = e2.table("consult_question").count()
    e2.process_consult_batch(consults.filter(F.col("internal_id") < "1004"), 0)
    assert e2.table("consult_question").count() == n_q

    assert e2.table("consult_request").count() == 8
    assert n_q == 16  # 2 questions per consult
    cancelled = e2.table("consult_request").filter("cancelled").count()
    closed = e2.table("consult_request").filter("closed_on_discharge").count()
    # fixture arithmetic at n=8: cancelled i%4==0 minus the DISCHAUTO
    # case i%8==4 -> {0}; closed {4}
    assert (cancelled, closed) == (1, 1)


def test_lab_and_flowsheet_tables_through_engine(spark, tmp_path):
    """D8-D11 through the one engine: lab children and typed
    observations equal the direct domain processors' current state."""
    from emap_spark.domains.labs import process_lab_orders
    from emap_spark.domains.observations import process_flowsheets
    from emap_spark.sources.generators import flowsheet_messages, micro_lab_messages

    labs = micro_lab_messages(spark, 10)
    flows = flowsheet_messages(spark, 30)
    eng = EmapEngine(storage_root=str(tmp_path / "lf"))
    eng.process_lab_batch(labs, 0)
    eng.process_flowsheet_batch(flows, 0)

    direct_labs = process_lab_orders({}, labs, "2024-06-01 00:00:00")
    for tbl, cols in (
        ("lab_sample", ["external_lab_number"]),
        ("lab_order", ["external_lab_number", "battery_code"]),
        ("lab_isolate", ["external_lab_number", "isolate_id", "isolate_code"]),
        ("lab_sensitivity", ["external_lab_number", "isolate_id", "agent", "sensitivity"]),
    ):
        got = sorted(tuple(str(r[c]) for c in cols) for r in eng.table(tbl).collect())
        want = sorted(
            tuple(str(r[c]) for c in cols)
            for r in direct_labs[tbl].live().select(*cols).collect()
        )
        assert got == want and got, tbl

    direct_flows = process_flowsheets(None, flows, "2024-06-01 00:00:00")
    cols = ["encounter", "observation_type", "value_as_real", "value_as_text"]
    got = sorted(tuple(str(r[c]) for c in cols) for r in eng.table("visit_observation").collect())
    want = sorted(
        tuple(str(r[c]) for c in cols) for r in direct_flows.live().select(*cols).collect()
    )
    assert got == want and len(got) == 30
