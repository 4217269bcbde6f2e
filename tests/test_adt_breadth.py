"""S5 trigger breadth + M8->D5 cancel routing + A29/A45/A47/A15 wiring.

Scenario fidelity targets: AdtMessageFactory.java:191-285 (trigger
switch), VisitController.java:163-238 (cancel clears admission/discharge
fields), PersonController deletePersonInformation (A29 tombstone),
PendingAdtController.java:69-145 (A15/A26 rank matching).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from emap_spark.app import EmapEngine
from emap_spark.schemas.interchange import ADT_SCHEMA
from emap_spark.sources.hl7_text import adt_from_hl7, synthetic_hl7_adt_full


def _adt_rows(spark, rows):
    """rows: list of dicts with partial ADT fields; missing tristates
    filled as IGNORE, missing plains as null."""
    import datetime

    def tri(v=None, status=None):
        return {"value": v, "status": status or ("SAVE" if v is not None else "IGNORE")}

    full = []
    for r in rows:
        d = {f.name: None for f in ADT_SCHEMA.fields}
        d["source_system"] = "EPIC"
        for f in ADT_SCHEMA.fields:
            if f.name not in r and f.dataType.typeName() == "struct":
                d[f.name] = tri()
        d.update(r)
        if isinstance(d["valid_from"], str):
            d["valid_from"] = datetime.datetime.fromisoformat(d["valid_from"])
        full.append(d)
    return spark.createDataFrame(full, ADT_SCHEMA)


def _lifecycle_msgs(spark):
    def tri_ts(s, status="SAVE"):
        import datetime

        return {"value": datetime.datetime.fromisoformat(s) if s else None, "status": status}

    return [
        {"source_message_id": "m1", "message_type": "ADMIT", "mrn": "P1",
         "visit_number": "V1", "valid_from": "2024-01-01 08:00:00",
         "admission_datetime": tri_ts("2024-01-01 08:00:00")},
        {"source_message_id": "m2", "message_type": "DISCHARGE", "mrn": "P1",
         "visit_number": "V1", "valid_from": "2024-01-01 12:00:00",
         "discharge_datetime": tri_ts("2024-01-01 12:00:00"),
         "discharge_disposition": {"value": "HOME", "status": "SAVE"}},
        {"source_message_id": "m3", "message_type": "CANCEL_DISCHARGE", "mrn": "P1",
         "visit_number": "V1", "valid_from": "2024-01-01 14:00:00"},
        {"source_message_id": "m4", "message_type": "DISCHARGE", "mrn": "P1",
         "visit_number": "V1", "valid_from": "2024-01-01 16:00:00",
         "discharge_datetime": tri_ts("2024-01-01 16:00:00")},
    ]


def test_trigger_breadth_counts(spark):
    out = adt_from_hl7(synthetic_hl7_adt_full(spark, n=40))
    counts = {r.message_type: r["count"] for r in out.groupBy("message_type").count().collect()}
    assert counts["SWAP_LOCATIONS"] == 4  # two A17s, two patients each
    assert counts["TRANSFER"] == 6  # A02 + A06 + A07
    assert counts["UPDATE_PATIENT_INFO"] == 6  # A08 + A28 + A31
    assert len(counts) == 16 and sum(counts.values()) == 42
    # MRG rekeying ids parsed
    merge = out.filter(F.col("message_type") == "MERGE").first()
    assert merge.retired_mrn.startswith("OLD")
    move = out.filter(F.col("message_type") == "MOVE_VISIT").first()
    assert move.retired_visit_number.startswith("OLDE")
    # A17 second patient has their own identifiers
    swaps = out.filter(F.col("message_type") == "SWAP_LOCATIONS").collect()
    assert len({r.mrn for r in swaps}) == 4
    assert all(r.nhs_number for r in swaps)
    # pending location comes from PV1-42
    pend = out.filter(F.col("message_type") == "PENDING_TRANSFER").first()
    assert pend.location["value"].startswith("T99^PEND")
    # death fields on the deceased A03 only
    deaths = out.filter(F.col("death_indicator")["status"] == "SAVE").collect()
    assert len(deaths) == 1 and deaths[0].death_datetime["value"] is not None


def test_cancel_discharge_permutation_invariant(spark):
    msgs = _lifecycle_msgs(spark)[:3]  # admit, discharge, cancel

    finals = set()
    for perm in itertools.permutations(msgs):
        for split in (1, 2):
            eng = EmapEngine()
            batches = [perm[:split], perm[split:]]
            for i, b in enumerate(batches):
                if b:
                    eng.process_batch(_adt_rows(spark, list(b)), i)
            v = eng.table("hospital_visit").collect()[0]
            finals.add(
                (str(v.admission_datetime), str(v.discharge_datetime),
                 str(v.discharge_disposition))
            )
    # every arrival order converges: discharged-then-cancelled
    assert finals == {("2024-01-01 08:00:00", "None", "None")}


def test_redischarge_after_cancel(spark):
    msgs = _lifecycle_msgs(spark)
    eng = EmapEngine()
    for i, m in enumerate(msgs):
        eng.process_batch(_adt_rows(spark, [m]), i)
    v = eng.table("hospital_visit").collect()[0]
    assert str(v.discharge_datetime) == "2024-01-01 16:00:00"
    # audit preserved the cancelled intermediate states (M7)
    asof = eng.table_asof("hospital_visit", "2024-01-01 13:00:00").collect()[0]
    assert str(asof.discharge_datetime) == "2024-01-01 12:00:00"
    asof2 = eng.table_asof("hospital_visit", "2024-01-01 15:00:00").collect()[0]
    assert asof2.discharge_datetime is None


def test_delete_person_tombstone(spark):
    rows = [
        {"source_message_id": "d1", "message_type": "ADMIT", "mrn": "P9",
         "visit_number": "V9", "valid_from": "2024-01-01 08:00:00",
         "name_family": {"value": "Smith", "status": "SAVE"}},
        {"source_message_id": "d2", "message_type": "DELETE_PERSON", "mrn": "P9",
         "valid_from": "2024-01-02 08:00:00"},
    ]
    eng = EmapEngine()
    eng.process_batch(_adt_rows(spark, rows), 0)
    assert eng.table("core_demographic").count() == 0  # tombstoned
    # the deletion is itself versioned (M9): as-of before it sees Smith
    asof = eng.table_asof("core_demographic", "2024-01-01 12:00:00").collect()
    assert len(asof) == 1 and asof[0].name_family == "Smith"


def test_pending_transfer_match_via_engine(spark):
    rows = [
        {"source_message_id": "p1", "message_type": "ADMIT", "mrn": "P2",
         "visit_number": "V2", "valid_from": "2024-01-01 08:00:00",
         "location": {"value": "W1^R1^B1", "status": "SAVE"}},
        {"source_message_id": "p2", "message_type": "PENDING_TRANSFER", "mrn": "P2",
         "visit_number": "V2", "valid_from": "2024-01-01 09:00:00",
         "location": {"value": "ICU^R2^B2", "status": "SAVE"}},
        {"source_message_id": "p3", "message_type": "CANCEL_PENDING_TRANSFER",
         "mrn": "P2", "visit_number": "V2", "valid_from": "2024-01-01 10:00:00",
         "location": {"value": "ICU^R2^B2", "status": "SAVE"}},
        {"source_message_id": "p4", "message_type": "PENDING_TRANSFER", "mrn": "P2",
         "visit_number": "V2", "valid_from": "2024-01-01 11:00:00",
         "location": {"value": "ICU^R2^B2", "status": "SAVE"}},
    ]
    eng = EmapEngine()
    eng.process_batch(_adt_rows(spark, rows), 0)
    pm = eng.planned_movements().orderBy("event_datetime").collect()
    assert [(str(p.event_datetime), p.cancelled) for p in pm] == [
        ("2024-01-01 09:00:00", True),
        ("2024-01-01 11:00:00", False),
    ]


def test_swap_and_identity_rekeying(spark):
    rows = [
        {"source_message_id": "s1", "message_type": "ADMIT", "mrn": "PA",
         "visit_number": "VA", "valid_from": "2024-01-01 08:00:00",
         "location": {"value": "W1^R^B1", "status": "SAVE"}},
        {"source_message_id": "s2", "message_type": "ADMIT", "mrn": "PB",
         "visit_number": "VB", "valid_from": "2024-01-01 08:00:00",
         "location": {"value": "W2^R^B2", "status": "SAVE"}},
        # A17: both patients move to each other's bed
        {"source_message_id": "s3", "message_type": "SWAP_LOCATIONS", "mrn": "PA",
         "visit_number": "VA", "valid_from": "2024-01-01 10:00:00",
         "location": {"value": "W2^R^B2", "status": "SAVE"}},
        {"source_message_id": "s3-B", "message_type": "SWAP_LOCATIONS", "mrn": "PB",
         "visit_number": "VB", "valid_from": "2024-01-01 10:00:00",
         "location": {"value": "W1^R^B1", "status": "SAVE"}},
        # A45: VB's stay moves to patient PC under a new encounter VC
        {"source_message_id": "s4", "message_type": "MOVE_VISIT", "mrn": "PC",
         "visit_number": "VC", "retired_visit_number": "VB",
         "valid_from": "2024-01-01 11:00:00"},
        # A47: PA is rekeyed to PZ
        {"source_message_id": "s5", "message_type": "CHANGE_IDENTIFIERS",
         "mrn": "PZ", "retired_mrn": "PA", "valid_from": "2024-01-01 12:00:00"},
    ]
    eng = EmapEngine()
    eng.process_batch(_adt_rows(spark, rows), 0)
    # swap opened new intervals for both visits
    occ = {r.visit_number: r.location_string for r in eng.occupancy("2024-01-01 10:30:00").collect()}
    assert occ == {"VA": "W2^R^B2", "VB": "W1^R^B1"}
    resolved = {r.encounter: r.mrn for r in eng.hospital_visits_resolved().collect()}
    assert resolved == {"VA": "PZ", "VC": "PC"}
    assert {r.mrn for r in eng.mrn_rekeyed().collect()} == {"PZ", "PB", "PC"}


def test_untrusted_source_creates_but_never_overwrites_visit(spark):
    """M6 -> D5 (DataSources.java:9 + visitShouldBeUpdated,
    VisitController.java:188-198): a hoover/databaseExtracts message may
    CREATE a visit; once EPIC has spoken, untrusted messages change
    nothing — in any arrival order."""
    import itertools

    hoover = {"source_message_id": "t1", "message_type": "ADMIT", "mrn": "PX",
              "visit_number": "VX", "valid_from": "2024-01-01 08:00:00",
              "source_system": "databaseExtracts",
              "patient_class": {"value": "OUTPATIENT", "status": "SAVE"}}
    epic = {"source_message_id": "t2", "message_type": "ADMIT", "mrn": "PX",
            "visit_number": "VX", "valid_from": "2024-01-01 09:00:00",
            "source_system": "EPIC",
            "patient_class": {"value": "INPATIENT", "status": "SAVE"}}
    hoover_late = {"source_message_id": "t3", "message_type": "UPDATE_PATIENT_INFO",
                   "mrn": "PX", "visit_number": "VX",
                   "valid_from": "2024-01-01 10:00:00",
                   "source_system": "databaseExtracts"}
    hoover2 = {**hoover, "source_message_id": "t4",
               "valid_from": "2024-01-01 11:00:00",
               "patient_class": {"value": "DAY_CASE", "status": "SAVE"}}

    # hoover alone creates the visit
    eng = EmapEngine()
    eng.process_batch(_adt_rows(spark, [hoover]), 0)
    assert eng.table("hospital_visit").collect()[0].patient_class == "OUTPATIENT"

    # with EPIC present, untrusted messages (older or newer) are inert
    finals = set()
    for perm in itertools.permutations([hoover, epic, hoover2]):
        eng = EmapEngine()
        for i, m in enumerate(perm):
            eng.process_batch(_adt_rows(spark, [m]), i)
        v = eng.table("hospital_visit").collect()[0]
        finals.add(v.patient_class)
    assert finals == {"INPATIENT"}


def test_untrusted_creation_leaves_time_slots_null(spark):
    """Advice round 2 #1: addPresentationAdmissionOrDischargeTime
    (VisitController.java:164-167) early-returns for untrusted sources
    even on creation — a hoover-created visit carries generic fields but
    leaves presentation/admission/discharge null for EPIC to fill; the
    visit's public valid_from is the hoover message's REAL time (#2)."""
    import datetime as _dt

    hoover = {"source_message_id": "h1", "message_type": "ADMIT", "mrn": "PY",
              "visit_number": "VY", "valid_from": "2024-02-01 08:00:00",
              "source_system": "databaseExtracts",
              "patient_class": {"value": "OUTPATIENT", "status": "SAVE"},
              "admission_datetime": {"value": _dt.datetime(2024, 2, 1, 8),
                                     "status": "SAVE"}}
    eng = EmapEngine()
    eng.process_batch(_adt_rows(spark, [hoover]), 0)
    v = eng.table("hospital_visit").collect()[0]
    assert v.patient_class == "OUTPATIENT"  # generic field carried
    assert v.admission_datetime is None
    assert v.discharge_datetime is None
    assert v.presentation_datetime is None
    assert str(v.valid_from) == "2024-02-01 08:00:00"  # not 1800-01-01

    # EPIC then fills the admission slot, at any event time
    epic = {"source_message_id": "h2", "message_type": "ADMIT", "mrn": "PY",
            "visit_number": "VY", "valid_from": "2024-02-01 07:00:00",
            "source_system": "EPIC",
            "admission_datetime": {"value": _dt.datetime(2024, 2, 1, 7),
                                   "status": "SAVE"}}
    eng.process_batch(_adt_rows(spark, [epic]), 1)
    v = eng.table("hospital_visit").collect()[0]
    assert str(v.admission_datetime) == "2024-02-01 07:00:00"
    assert str(v.valid_from) == "2024-02-01 07:00:00"
