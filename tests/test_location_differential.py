"""Differential property test for D6 incremental location-visit
maintenance: for ANY arrival order and ANY batch split of a visit's
movement messages, the incrementally-maintained replace-set table must
equal the full-history recompute (the full recompute IS the model —
no hand-written expectations to get wrong).

test_replay_scaling pins the equivalence for fresh-key batches; this
suite randomizes PERMUTATION x SPLIT of the same two visits' messages,
so the bucket-pruned touched-visit recompute sees the hard cases:
a visit touched across several batches, transfers arriving before
their admit, discharges in the first batch.

CI runs derandomized with a bounded example budget; set
HYPOTHESIS_EXPLORE=1 for a wider randomized search (the merge
differential suite's convention).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from emap_spark.app import EmapEngine
from emap_spark.operators.locations import infer_location_visits
from emap_spark.sources.generators import adt_messages

settings.register_profile(
    "loc_ci", derandomize=True, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
settings.register_profile(
    "loc_explore", derandomize=False, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
settings.load_profile(
    "loc_explore" if os.environ.get("HYPOTHESIS_EXPLORE") else "loc_ci"
)

_N_MSGS = 8  # adt_messages(n_patients=2): admit/2 transfers/discharge x 2


def _intervals(df):
    return sorted(
        (r.visit_number, r.location_string, str(r.admission_datetime),
         str(r.discharge_datetime))
        for r in df.collect()
    )


@settings(
    max_examples=6 * (4 if os.environ.get("HYPOTHESIS_EXPLORE") else 1),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    perm=st.permutations(list(range(_N_MSGS))),
    splits=st.lists(
        st.integers(0, 2), min_size=_N_MSGS, max_size=_N_MSGS
    ),
)
def test_incremental_equals_full_under_any_order_and_split(
    spark, perm, splits
):
    pool = adt_messages(spark, n_patients=2)
    ids = sorted(r.source_message_id for r in pool.select(
        "source_message_id").collect())
    assert len(ids) == _N_MSGS
    # message i (in permuted order) lands in batch splits[i]
    by_batch: dict[int, list[str]] = {}
    for pos, msg_idx in enumerate(perm):
        by_batch.setdefault(splits[pos], []).append(ids[msg_idx])

    root = tempfile.mkdtemp(prefix="d6diff_")
    try:
        eng = EmapEngine(storage_root=root, maintain_location_visits=True)
        for b in sorted(by_batch):
            batch = pool.filter(
                F.col("source_message_id").isin(by_batch[b])
            )
            eng.process_batch(batch, b)
        maintained = _intervals(eng.location_visits())
        full = _intervals(infer_location_visits(eng._movement_history()))
        assert maintained == full, (perm, splits)
        # every location event produced an interval: 3 per visit
        assert len(maintained) == 6
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_incremental_equals_full_smoke_reversed(spark):
    """Deterministic pin of the nastiest shape: the whole sequence
    arrives in REVERSE order, one message per batch (every batch
    re-touches the same visits)."""
    pool = adt_messages(spark, n_patients=1)
    ids = [r.source_message_id for r in pool.select(
        "source_message_id").collect()]
    root = tempfile.mkdtemp(prefix="d6rev_")
    try:
        eng = EmapEngine(storage_root=root, maintain_location_visits=True)
        for b, mid in enumerate(reversed(sorted(ids))):
            eng.process_batch(
                pool.filter(F.col("source_message_id") == mid), b
            )
        maintained = _intervals(eng.location_visits())
        full = _intervals(infer_location_visits(eng._movement_history()))
        assert maintained == full
        assert len(maintained) == 3
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_history_log_tolerates_duplicate_deliveries(spark):
    """The r8 write-path contract: the movement-history log is written
    WITHOUT a dedup shuffle, so an at-least-once redelivery lands
    duplicate rows in the log — every reader dedups by
    source_message_id, so location visits (both the maintained
    incremental table and the full recompute) are identical to the
    clean-feed result."""
    pool = adt_messages(spark, n_patients=2)
    root_a = tempfile.mkdtemp(prefix="d6dupa_")
    root_b = tempfile.mkdtemp(prefix="d6dupb_")
    try:
        clean = EmapEngine(storage_root=root_a, maintain_location_visits=True)
        clean.process_batch(pool, 0)

        # the same batch with every message delivered TWICE
        dup = EmapEngine(storage_root=root_b, maintain_location_visits=True)
        dup.process_batch(pool.unionByName(pool), 0)

        a_inc = _intervals(clean.location_visits())
        b_inc = _intervals(dup.location_visits())
        assert a_inc == b_inc and len(a_inc) == 6
        a_full = _intervals(infer_location_visits(clean._movement_history()))
        b_full = _intervals(infer_location_visits(dup._movement_history()))
        assert a_full == b_full == a_inc
    finally:
        shutil.rmtree(root_a, ignore_errors=True)
        shutil.rmtree(root_b, ignore_errors=True)
