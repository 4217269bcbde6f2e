"""D6: location-visit inference — the most complex operator in the
reference (core/.../controllers/PatientLocationController.java:77-836,
836 LoC of incremental index juggling).

Spark-first design (SURVEY.md §7 step 4): instead of porting the
incremental algorithm, RECOMPUTE each visit's interval sequence from its
full movement-event history with window functions. Same final states,
permutation-invariant by construction (the incremental version exists
only because the reference processes one message at a time).

Semantics reproduced:
- arrivals (ADMIT/TRANSFER) open an interval at the event location;
  the next movement closes it (getIndexOfCurrentAndNextLocationVisit
  :186-249 collapses to lead() once history is sorted)
- DISCHARGE closes the last open interval (:424-475)
- cancellation messages (CANCEL_*) void their matching movement: i-th
  cancel of a (visit, type, location) matches the i-th event (:589-659's
  closest-match, made order-invariant by rank pairing)
- a gap revealed by previous_location mismatch materializes an inferred
  interval with inferred_admission/inferred_discharge flags
  (inferPreviousLocationData :477-517)
- UPDATE_PATIENT_INFO never creates or moves visits (:160-170)
- zero-length stays are guarded (:384-396): same-timestamp moves keep
  only the last arrival per (visit, time)

One shuffle on visit_number; all logic is within-partition windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# SWAP_LOCATIONS rows are per-patient moves (each A17 half carries that
# patient's new location), so they open intervals exactly like transfers
ARRIVAL_TYPES = ("ADMIT", "TRANSFER", "SWAP_LOCATIONS")
CANCEL_OF = {
    "CANCEL_ADMIT": "ADMIT",
    "CANCEL_TRANSFER": "TRANSFER",
    "CANCEL_DISCHARGE": "DISCHARGE",
}


def _void_cancelled(moves: DataFrame) -> DataFrame:
    """Pair each cancel with its rank-matched target and drop both."""
    base_type = F.col("message_type")
    for c, t in CANCEL_OF.items():
        base_type = F.when(F.col("message_type") == c, F.lit(t)).otherwise(base_type)
    is_cancel = F.col("message_type").isin(*CANCEL_OF)
    m = moves.withColumn("base_type", base_type).withColumn("is_cancel", is_cancel)
    wk = W.partitionBy("visit_number", "base_type", "loc").orderBy("valid_from", "source_message_id")
    m = m.withColumn(
        "pair_rank",
        F.sum(F.when(F.col("is_cancel"), 0).otherwise(1)).over(
            wk.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    # i-th cancel in a (visit,type,loc) group voids the i-th real event
    cancels = m.filter(F.col("is_cancel")).withColumn(
        "void_rank",
        F.row_number().over(
            W.partitionBy("visit_number", "base_type", "loc").orderBy(
                "valid_from", "source_message_id"
            )
        ),
    )
    events = m.filter(~F.col("is_cancel")).withColumn(
        "event_rank",
        F.row_number().over(
            W.partitionBy("visit_number", "base_type", "loc").orderBy(
                "valid_from", "source_message_id"
            )
        ),
    )
    voided = cancels.select(
        "visit_number", "base_type", "loc", F.col("void_rank").alias("event_rank")
    )
    return events.join(
        voided, ["visit_number", "base_type", "loc", "event_rank"], "left_anti"
    )


def infer_location_visits(adt: DataFrame) -> DataFrame:
    """adt: ADT_SCHEMA-shaped messages (tri-state location structs).

    Returns location_visit rows: (visit_number, location_string,
    admission_datetime, discharge_datetime, inferred_admission,
    inferred_discharge).
    """
    moves = adt.filter(
        F.col("message_type").isin(*ARRIVAL_TYPES, "DISCHARGE", *CANCEL_OF)
    ).select(
        "visit_number",
        "message_type",
        "valid_from",
        "source_message_id",
        F.col("location")["value"].alias("loc"),
        F.col("previous_location")["value"].alias("prev_loc"),
    )
    moves = _void_cancelled(moves)

    # zero-length guard: same (visit, time) keeps the last message only
    wt = W.partitionBy("visit_number", "valid_from").orderBy(F.col("source_message_id").desc())
    moves = moves.withColumn("__tie", F.row_number().over(wt)).filter(F.col("__tie") == 1)

    wv = W.partitionBy("visit_number").orderBy("valid_from", "source_message_id")
    seq = (
        moves.withColumn("next_type", F.lead("message_type").over(wv))
        .withColumn("next_base", F.lead("base_type").over(wv))
        .withColumn("next_t", F.lead("valid_from").over(wv))
        .withColumn("next_loc", F.lead("loc").over(wv))
        .withColumn("next_prev_loc", F.lead("prev_loc").over(wv))
        .withColumn(
            "prev_arrival_loc",
            F.last(
                F.when(F.col("base_type").isin(*ARRIVAL_TYPES), F.col("loc")),
                ignorenulls=True,
            ).over(wv.rowsBetween(W.unboundedPreceding, -1)),
        )
    )

    # inferred-interval offsets mirror inferPreviousLocationData
    # (:477-517): the gap stay squeezed before a closing event occupies
    # [t-3s, t-2s]; a stay whose end is only implied closes at t-2s; a
    # discharge that OPENS its own stay admits at t-1s — all duration-
    # bearing, all flagged, never colliding with real event times.
    s1, s2, s3 = (F.expr(f"INTERVAL {n} SECONDS") for n in (1, 2, 3))

    arrivals = seq.filter(F.col("base_type").isin(*ARRIVAL_TYPES))
    # the next event implies this stay ended EARLIER than the event when
    # (a) it squeezed an unseen previous location in between, or (b) it
    # is a discharge that happened somewhere else
    gap_next = F.col("next_prev_loc").isNotNull() & (
        F.col("next_prev_loc") != F.col("loc")
    )
    discharge_elsewhere = (
        (F.col("next_base") == "DISCHARGE")
        & F.col("next_loc").isNotNull()
        & (F.col("next_loc") != F.col("loc"))
    )
    implied_end = gap_next | discharge_elsewhere
    intervals = arrivals.select(
        "visit_number",
        F.col("loc").alias("location_string"),
        F.col("valid_from").alias("admission_datetime"),
        F.when(
            F.col("next_type").isNotNull(),
            F.when(implied_end, F.col("next_t") - s2).otherwise(F.col("next_t")),
        ).alias("discharge_datetime"),
        F.lit(False).alias("inferred_admission"),
        F.when(F.col("next_type").isNotNull(), implied_end)
        .otherwise(F.lit(False))
        .alias("inferred_discharge"),
    )

    # gap repair: the next event's previous_location names a location we
    # never saw an arrival for -> inferred interval squeezed between the
    # known stay and the next event (inferPreviousLocationData :477-517)
    inferred = (
        arrivals.filter(gap_next)
        .select(
            "visit_number",
            F.col("next_prev_loc").alias("location_string"),
            (F.col("next_t") - s3).alias("admission_datetime"),
            (F.col("next_t") - s2).alias("discharge_datetime"),
            F.lit(True).alias("inferred_admission"),
            F.lit(True).alias("inferred_discharge"),
        )
    )

    # discharge-opens-stay (:424-475 + createLocationWithInferredAdmit):
    # a discharge at a location with no open stay materializes the stay
    # it closes, with an inferred admission one second before
    discharges = seq.filter(F.col("base_type") == "DISCHARGE")
    opens = discharges.filter(
        F.col("loc").isNotNull()
        & (
            F.col("prev_arrival_loc").isNull()
            | (F.col("prev_arrival_loc") != F.col("loc"))
        )
    ).select(
        "visit_number",
        F.col("loc").alias("location_string"),
        (F.col("valid_from") - s1).alias("admission_datetime"),
        F.col("valid_from").alias("discharge_datetime"),
        F.lit(True).alias("inferred_admission"),
        F.lit(False).alias("inferred_discharge"),
    )
    # an orphan discharge (no arrivals at all) may still name an unseen
    # previous location -> squeeze its gap stay in as well
    orphan_gaps = discharges.filter(
        F.col("prev_arrival_loc").isNull()
        & F.col("prev_loc").isNotNull()
        & (F.col("prev_loc") != F.col("loc"))
    ).select(
        "visit_number",
        F.col("prev_loc").alias("location_string"),
        (F.col("valid_from") - s3).alias("admission_datetime"),
        (F.col("valid_from") - s2).alias("discharge_datetime"),
        F.lit(True).alias("inferred_admission"),
        F.lit(True).alias("inferred_discharge"),
    )
    return (
        intervals.unionByName(inferred)
        .unionByName(opens)
        .unionByName(orphan_gaps)
    )


def occupancy(location_visits: DataFrame, at) -> DataFrame:
    """Q7: who is where at time t (open interval containing t)."""
    t = F.lit(at).cast("timestamp_ntz")
    return location_visits.filter(
        (F.col("admission_datetime") <= t)
        & (F.col("discharge_datetime").isNull() | (t < F.col("discharge_datetime")))
    )


def repair_orphan_waveforms(waveforms: DataFrame, location_visits: DataFrame) -> DataFrame:
    """Attach-later repair for orphan waveform rows (SURVEY §7 hard
    parts; waveform_hf_data.md:96-126 discusses, the reference leaves
    visit NULL forever, WaveformController.java:60-66 — we can do
    better with a periodic repair join).

    waveforms: rows with nullable `visit_number`; orphans re-join
    against the (possibly newer) location_visit intervals; attached rows
    pass through unchanged. Only orphans shuffle."""
    orphans = waveforms.filter(F.col("visit_number").isNull()).drop("visit_number")
    attached = waveforms.filter(F.col("visit_number").isNotNull())
    lv = location_visits.select(
        F.col("visit_number").alias("lv_visit"),
        F.col("location_string"),
        F.col("admission_datetime"),
        F.col("discharge_datetime"),
    )
    repaired = (
        orphans.join(
            lv,
            (F.col("source_location") == F.col("location_string"))
            & (F.col("observation_datetime") >= F.col("admission_datetime"))
            & (
                F.col("discharge_datetime").isNull()
                | (F.col("observation_datetime") < F.col("discharge_datetime"))
            ),
            "left",
        )
        .select(*orphans.columns, F.col("lv_visit").alias("visit_number"))
    )
    return attached.unionByName(repaired.select(*attached.columns))
