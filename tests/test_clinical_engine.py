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
