"""Differential/generative testing of the merge engine (the reference's
PermutationTestCase §5.3 technique, upgraded): hypothesis generates
random message sequences; a pure-Python sequential-application model
(one message at a time, exactly the reference's processing style)
computes the expected state; merge_batch folding the whole set at once
must agree.

Two hypothesis profiles: CI runs DERANDOMIZED (deterministic green —
NOTE derandomize=True disables the .hypothesis example database, so a
found falsifier has regression value ONLY once pinned as an @example;
pin every one); set HYPOTHESIS_EXPLORE=1 to search fresh random
examples with a bigger budget (how every bug this suite has found was
found — run it whenever the engine is touched).
"""

from __future__ import annotations

import datetime
import os

import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st

settings.register_profile(
    "ci", derandomize=True, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
settings.register_profile(
    "explore", derandomize=False, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
settings.load_profile(
    "explore" if os.environ.get("HYPOTHESIS_EXPLORE") else "ci"
)

# explore searches 4x deeper than CI (VERDICT r4 next-step #9 ratchet —
# this harness found every real engine bug three rounds running, so its
# scheduled budget grows); per-test @settings would otherwise pin the
# profile's example count.
_EXPLORE_MULT = (
    int(os.environ.get("HYPOTHESIS_EXPLORE_MULT", "4"))
    if os.environ.get("HYPOTHESIS_EXPLORE")
    else 1
)
# message-sequence depth knob for explore runs: longer sequences
# exercise interactions (multiple retro-creations/voids interleaved
# across batches) the default bound cannot express
_MAX_MSGS = int(os.environ.get("EMAP_DIFF_MAX_MSGS", "8"))


def _n(n: int) -> int:
    return n * _EXPLORE_MULT
from pyspark.sql import Row, types as T

from emap_spark.operators.merge import (
    ASSIGN,
    FILL_IF_NULL,
    TRISTATE,
    MergeSpec,
    merge_batch,
    merge_batch_versions,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("valid_from", T.TimestampNTZType()),
        T.StructField("seq", T.LongType()),
        T.StructField("a", T.StringType()),  # ASSIGN
        T.StructField("f", T.StringType()),  # FILL_IF_NULL
        T.StructField(
            "t",
            T.StructType(
                [T.StructField("value", T.StringType()), T.StructField("status", T.StringType())]
            ),
        ),
        T.StructField("dead", T.BooleanType()),
    ]
)

SPEC = MergeSpec(
    key=["k"],
    fields={"a": ASSIGN, "f": FILL_IF_NULL, "t": TRISTATE},
    event_time="valid_from",
    seq="seq",
    tombstone="dead",
)


def _model_apply(cur, m, created: bool) -> None:
    """One message onto one entity, reference-style: valid_from only
    advances when a field actually changed or the entity was created
    (RowState.saveEntityOrAuditLogIfRequired fires on entityCreated /
    entityUpdated alone, RowState.java:186-199)."""
    new_a = m["a"]  # ASSIGN carries even nulls
    new_f = cur["f"] if m["f"] is None else m["f"]
    new_t = cur["t"]
    ts = m["t"]
    if ts is not None and ts["status"] == "SAVE":
        new_t = ts["value"]
    elif ts is not None and ts["status"] == "DELETE":
        new_t = None
    changed = created or (new_a, new_f, new_t) != (cur["a"], cur["f"], cur["t"])
    cur["a"], cur["f"], cur["t"] = new_a, new_f, new_t
    if changed:
        cur["vf"] = m["valid_from"]
    cur["deleted"] = False


def model_fold(messages):
    """Reference-style sequential application in (valid_from, seq) order."""
    state: dict[str, dict] = {}
    for m in sorted(messages, key=lambda m: (m["valid_from"], m["seq"])):
        k = m["k"]
        if m["dead"]:
            cur = state.get(k)
            if cur is None or not cur["deleted"]:  # repeat delete = no-op
                state[k] = {"deleted": True, "a": None, "f": None, "t": None,
                            "vf": m["valid_from"]}
            continue
        cur = state.get(k)
        created = cur is None or cur["deleted"]
        if created:
            cur = {"deleted": False, "a": None, "f": None, "t": None, "vf": None}
            state[k] = cur
        # sequential: each message is newer than current by construction
        _model_apply(cur, m, created)
    return {
        k: (v["a"], v["f"], v["t"], v["vf"])
        for k, v in state.items()
        if not v["deleted"]
    }


def assert_matches_model(got, expected):
    """Cross-batch comparisons: VALUES and liveness must equal the
    sequential model exactly — they are the engine's invariant. The
    public valid_from is exact for in-order arrival (the single-batch
    test and the chronological q61 oracle) but NOT reconstructible
    under arbitrary splits: reference-style no-op collapsing (validFrom
    only advances on real changes; no version rows for no-ops) destroys
    exactly the information — when values were reasserted, which writes
    were duplicates — that in-order change attribution needs, and no
    incremental engine keeps the full message history to recover it.
    (The reference itself is fully arrival-dependent here.) The
    newer-wins boundary that keeps VALUES exact survives separately as
    the __seen_t metadata."""
    assert {k: v[:3] for k, v in got.items()} == {
        k: v[:3] for k, v in expected.items()
    }


msg_strategy = st.fixed_dictionaries(
    {
        "k": st.sampled_from(["x", "y"]),
        "minute": st.integers(0, 30),
        "a": st.sampled_from([None, "a1", "a2"]),
        "f": st.sampled_from([None, "f1", "f2"]),
        "tmode": st.sampled_from(["ignore", "save1", "save2", "delete"]),
        "dead": st.booleans(),
    }
)


@settings(
    max_examples=_n(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(msg_strategy, min_size=1, max_size=_MAX_MSGS))
def test_batch_fold_equals_sequential_model(spark, raw):
    messages = []
    for i, r in enumerate(raw):
        t = {"ignore": Row(value=None, status="IGNORE"),
             "save1": Row(value="t1", status="SAVE"),
             "save2": Row(value="t2", status="SAVE"),
             "delete": Row(value=None, status="DELETE")}[r["tmode"]]
        messages.append(
            {
                "k": r["k"],
                # distinct timestamps per message: sequential model == M4 order
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": t,
                "dead": r["dead"] and i % 3 == 0,  # fewer tombstones
            }
        )
    df = spark.createDataFrame(
        [Row(**{**m, "t": m["t"]}) for m in messages], SCHEMA
    )
    res = merge_batch(None, df, SPEC, "2024-06-01 00:00:00")
    got = {
        r.k: (r.a, r.f, r.t, r.valid_from) for r in res.live().collect()
    }
    expected = model_fold(
        [{**m, "t": None if m["t"] is None else {"value": m["t"].value, "status": m["t"].status}}
         for m in messages]
    )
    assert got == expected


@settings(
    max_examples=_n(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(
    # r6 falsifier (found as the ADT cancel-discharge permutation break):
    # batch 0 ends with a DELETE of an already-null tristate — a
    # no-visible-change action that is change-gated out of the versions,
    # so the stored current row is an EARLIER fold row. Its per-field
    # __ts must still carry the delete's time (key-final, not
    # per-row), or the older SAVE arriving alone in batch 1 resurrects
    # the cancelled value.
    raw=[
        {"k": "x", "minute": 8, "a": "a1", "f": None, "tmode": "ignore", "dead": False},
        {"k": "x", "minute": 14, "a": "a1", "f": None, "tmode": "delete", "dead": False},
        {"k": "x", "minute": 12, "a": "a1", "f": None, "tmode": "save1", "dead": False},
    ],
    split=[0, 0, 1],
)
@given(
    st.lists(msg_strategy, min_size=1, max_size=_MAX_MSGS),
    st.lists(st.integers(0, 2), min_size=2, max_size=8),
)
def test_message_granularity_fold_equals_sequential_model(spark, raw, split):
    """The same differential, MESSAGE granularity (verdict r3 #4): the
    random stream, split into random batches, applied through
    merge_batch_versions (the reference-exact audit path) must reach the
    sequential model's final state — and every intermediate version must
    chain (valid_until of the superseded == valid_from of the
    superseder, per key, in __v order)."""
    import itertools as it

    messages = []
    for i, r in enumerate(raw):
        t = {"ignore": Row(value=None, status="IGNORE"),
             "save1": Row(value="t1", status="SAVE"),
             "save2": Row(value="t2", status="SAVE"),
             "delete": Row(value=None, status="DELETE")}[r["tmode"]]
        messages.append(
            {
                "k": r["k"],
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": t,
                "dead": r["dead"] and i % 3 == 0,
            }
        )
    expected = model_fold(
        [{**m, "t": None if m["t"] is None else {"value": m["t"].value, "status": m["t"].status}}
         for m in messages]
    )
    batches = [[], [], []]
    for m, b in zip(messages, it.cycle(split)):
        batches[b].append(m)
    cur = None
    for bid, b in enumerate(batches):
        if not b:
            continue
        df = spark.createDataFrame([Row(**m) for m in b], SCHEMA)
        res = merge_batch_versions(cur, df, SPEC, f"2024-06-01 00:00:{bid:02d}")
        cur = res.current.localCheckpoint()
    got = {
        r.k: (r.a, r.f, r.t, r.valid_from)
        for r in cur.filter(~cur.is_deleted).collect()
    }
    assert_matches_model(got, expected)


TRUSTED_SCHEMA = T.StructType(
    SCHEMA.fields + [T.StructField("trusted", T.BooleanType())]
)

TRUSTED_SPEC = MergeSpec(
    key=["k"],
    fields={"a": ASSIGN, "f": FILL_IF_NULL, "t": TRISTATE},
    event_time="valid_from",
    seq="seq",
    trusted="trusted",
    tombstone="dead",
)

# trust is a PER-KEY property in THIS suite ('x' = trusted feed, 'u' =
# untrusted feed) — the reference's actual topology (each queue/source
# system is trusted or not as a whole). Round 5 closed the within-key
# mixing envelope too (shadow marks, merge.py _shadow_templates):
# test_mixed_trust_per_key below samples trust PER MESSAGE.
_TRUST = {"x": True, "u": False}


def model_fold_trusted(messages):
    """Sequential reference model with M6: an untrusted message acts only
    as the key's very first event (create / create-tombstone); the
    engine's batch-split-invariant reading is earliest-event-creation-
    wins, which per-feed trust reduces to exactly this rule."""
    state: dict[str, dict] = {}
    for m in sorted(messages, key=lambda m: (m["valid_from"], m["seq"])):
        k = m["k"]
        cur = state.get(k)
        if not m["trusted"]:
            if cur is not None:
                continue  # M6: may only create
            if m["dead"]:
                state[k] = {"deleted": True, "a": None, "f": None, "t": None,
                            "vf": m["valid_from"]}
                continue
            cur = {"deleted": False, "a": None, "f": None, "t": None, "vf": None}
            state[k] = cur
            created = True
        else:
            if m["dead"]:
                if cur is None or not cur["deleted"]:
                    state[k] = {"deleted": True, "a": None, "f": None,
                                "t": None, "vf": m["valid_from"]}
                continue
            created = cur is None or cur["deleted"]
            if created:
                cur = {"deleted": False, "a": None, "f": None, "t": None, "vf": None}
                state[k] = cur
        _model_apply(cur, m, created)
    return {
        k: (v["a"], v["f"], v["t"], v["vf"])
        for k, v in state.items()
        if not v["deleted"]
    }


trusted_msg_strategy = st.fixed_dictionaries(
    {
        "k": st.sampled_from(["x", "u"]),
        "minute": st.integers(0, 30),
        "a": st.sampled_from([None, "a1", "a2"]),
        "f": st.sampled_from([None, "f1", "f2"]),
        "tmode": st.sampled_from(["ignore", "save1", "save2", "delete"]),
        "dead": st.booleans(),
    }
)


@settings(
    max_examples=_n(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(trusted_msg_strategy, min_size=1, max_size=_MAX_MSGS),
    st.lists(st.integers(0, 2), min_size=2, max_size=8),
)
# pinned falsifier (explore run, round 4): a voided untrusted
# creation-TOMBSTONE must not leave an incarnation floor behind when an
# earlier creator replaces it — the delete never happened in replay
@example(
    raw=[
        {"k": "u", "minute": 30, "a": None, "f": None, "tmode": "ignore",
         "dead": True},
        {"k": "u", "minute": 0, "a": None, "f": None, "tmode": "save2",
         "dead": False},
    ],
    split=[0, 1],
)
def test_trusted_matrix_batch_and_versions_agree_with_model(spark, raw, split):
    """Full policy matrix with M6 trust (verdict r3 #4): the same random
    stream under random batch splits through BOTH merge granularities
    must equal the sequential model — including untrusted creation
    contests resolved by earliest real event time."""
    import itertools as it

    messages = []
    for i, r in enumerate(raw):
        t = {"ignore": Row(value=None, status="IGNORE"),
             "save1": Row(value="t1", status="SAVE"),
             "save2": Row(value="t2", status="SAVE"),
             "delete": Row(value=None, status="DELETE")}[r["tmode"]]
        messages.append(
            {
                "k": r["k"],
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": t,
                "dead": r["dead"] and i % 3 == 0,
                "trusted": _TRUST[r["k"]],
            }
        )
    expected = model_fold_trusted(
        [{**m, "t": None if m["t"] is None else {"value": m["t"].value, "status": m["t"].status}}
         for m in messages]
    )
    batches = [[], [], []]
    for m, b in zip(messages, it.cycle(split)):
        batches[b].append(m)

    def run(merge):
        cur = None
        for bid, b in enumerate(batches):
            if not b:
                continue
            df = spark.createDataFrame([Row(**m) for m in b], TRUSTED_SCHEMA)
            cur = merge(cur, df, TRUSTED_SPEC, f"2024-06-01 00:00:{bid:02d}").current
            cur = cur.localCheckpoint()
        return {
            r.k: (r.a, r.f, r.t, r.valid_from)
            for r in cur.filter(~cur.is_deleted).collect()
        }

    got_batch = run(merge_batch)
    got_versions = run(merge_batch_versions)
    assert_matches_model(got_batch, expected)
    assert_matches_model(got_versions, expected)


@settings(
    max_examples=_n(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(msg_strategy, min_size=2, max_size=_MAX_MSGS),
    st.lists(st.integers(0, 2), min_size=2, max_size=8),
)
def test_all_persistence_modes_agree(spark, tmp_path_factory, raw, split):
    """Differential over the PERSISTENCE layer: the same random message
    stream, split into random batches, must reach the same final state
    through (a) the in-memory full fold, (b) the DeltaLog incremental
    MERGE (touched-keys seed, delta commits), and (c) the SnapshotStore
    full rewrite — and all must equal the sequential reference model."""
    import itertools as it

    from pyspark.sql import functions as F

    from emap_spark.storage import DeltaLog, SnapshotStore

    messages = []
    for i, r in enumerate(raw):
        t = {"ignore": Row(value=None, status="IGNORE"),
             "save1": Row(value="t1", status="SAVE"),
             "save2": Row(value="t2", status="SAVE"),
             "delete": Row(value=None, status="DELETE")}[r["tmode"]]
        messages.append(
            {
                "k": r["k"],
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": t,
                "dead": r["dead"] and i % 3 == 0,
            }
        )
    expected = model_fold(
        [{**m, "t": None if m["t"] is None else {"value": m["t"].value, "status": m["t"].status}}
         for m in messages]
    )
    # random batch assignment (messages arrive in arbitrary batches)
    batches = [[], [], []]
    for m, b in zip(messages, it.cycle(split)):
        batches[b].append(m)
    frames = [
        spark.createDataFrame([Row(**m) for m in b], SCHEMA) if b else None
        for b in batches
    ]

    def snap_state(cur_df):
        live = cur_df.filter(~F.col("is_deleted"))
        return {r.k: (r.a, r.f, r.t, r.valid_from) for r in live.collect()}

    # (a) in-memory full fold
    cur = None
    for f in frames:
        if f is None:
            continue
        cur = merge_batch(cur, f, SPEC, "2024-06-01 00:00:00").current
    mem_state = snap_state(cur)
    assert_matches_model(mem_state, expected)

    # (b) DeltaLog incremental + (c) Snapshot full
    base = tmp_path_factory.mktemp("stores")
    delta = DeltaLog(str(base / "d"), "t", ["k"], compact_every=2)
    snapshot = SnapshotStore(str(base / "s"), "t", ["k"])
    delta.load(spark)
    snapshot.load(spark)
    for bid, f in enumerate(frames):
        if f is None:
            continue
        stored = f"2024-06-01 00:00:{bid:02d}"
        current = delta.read_current(keys=f.select("k").distinct())
        delta.commit(bid, merge_batch(current, f, SPEC, stored).combined)
        snapshot.commit(
            bid, merge_batch(snapshot.read_current(), f, SPEC, stored).combined
        )
    # persistence layers must agree with the in-memory fold EXACTLY
    # (same engine, same knowledge — including valid_from)
    assert snap_state(delta.read_current()) == mem_state
    assert snap_state(snapshot.read_current()) == mem_state


# ---------------------------------------------------------------------------
# Mixed trust WITHIN a key (VERDICT r4 next-step #5): the reference
# resolves trust per MESSAGE against the stored entity
# (visitShouldBeUpdated, core/.../VisitController.java:188-204), so a
# key's stream may interleave trusted and untrusted sources. Round 5
# closes the previously-documented approximation corner with shadow
# marks (merge.py _shadow_templates).
# ---------------------------------------------------------------------------

mixed_msg_strategy = st.fixed_dictionaries(
    {
        "k": st.sampled_from(["x", "u"]),
        "minute": st.integers(0, 30),
        "a": st.sampled_from([None, "a1", "a2"]),
        "f": st.sampled_from([None, "f1", "f2"]),
        "tmode": st.sampled_from(["ignore", "save1", "save2", "delete"]),
        "dead": st.booleans(),
        "trusted": st.booleans(),  # per MESSAGE, not per key
    }
)


@settings(
    max_examples=_n(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(
    # r6 explore falsifier (latent since the m6 machinery landed): an
    # untrusted creation carrying a FILL value, then a TRUSTED all-null
    # update with an EARLIER event time arriving alone in a later
    # batch. In global event order the trusted message creates first
    # and the untrusted creation is skipped — so its fill value must
    # vanish; the precedence floor alone cannot dislodge a fill, the
    # stored untrusted seeds must be voided (m6_tr_voids).
    raw=[
        {"k": "x", "minute": 0, "a": None, "f": None, "tmode": "ignore",
         "dead": False, "trusted": False},
        {"k": "u", "minute": 28, "a": None, "f": "f2", "tmode": "ignore",
         "dead": False, "trusted": False},
        {"k": "u", "minute": 0, "a": None, "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
    ],
    split=[0, 0, 2],
)
@example(
    # r6 mult-8 explore falsifier (the MIXED-incarnation void): an
    # untrusted creation carrying FILL + TRISTATE, a later trusted
    # ASSIGN write (flips the row-level __untrusted off), then an
    # EARLIER untrusted retro-creator alone in a later batch — the
    # creation is skipped in event order, so its fill/tristate must
    # vanish while the trusted ASSIGN survives (per-field floored-__ts
    # provenance).
    raw=[
        {"k": "u", "minute": 7, "a": None, "f": "f1", "tmode": "save1",
         "dead": False, "trusted": False},
        {"k": "u", "minute": 26, "a": "a1", "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
        {"k": "u", "minute": 0, "a": None, "f": None, "tmode": "ignore",
         "dead": False, "trusted": False},
    ],
    split=[0, 0, 2],
)
@example(
    # the mirror case: the void arrives as an earlier TRUSTED update
    # (m6_tr_voids generalized beyond pure-untrusted anchors)
    raw=[
        {"k": "u", "minute": 7, "a": None, "f": "f1", "tmode": "save1",
         "dead": False, "trusted": False},
        {"k": "u", "minute": 26, "a": "a1", "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
        {"k": "u", "minute": 0, "a": None, "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
    ],
    split=[0, 0, 2],
)
@example(
    # r6 SECOND explore falsifier (purity): batch 0 = untrusted creator
    # @0:02 + trusted NO-OP @26 (a=NULL over the creation's NULL — it is
    # change-gated, so the creation's row and its __untrusted flag stay
    # current, but __seen_t advances to 26). Batch 2's trusted a1 @0:00
    # then retro-creates in event order, the untrusted creation is
    # skipped — and the ABSORBED tr@26 a=NULL must still win (final a =
    # NULL). A wholesale void keyed on the row flag alone dropped the
    # absorbed no-op with the creation; purity (__seen_t at the floor)
    # is the correct wholesale-void gate.
    raw=[
        {"k": "u", "minute": 0, "a": "a1", "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
        {"k": "u", "minute": 26, "a": None, "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
        {"k": "u", "minute": 0, "a": None, "f": None, "tmode": "ignore",
         "dead": False, "trusted": False},
    ],
    split=[2, 0, 0],
)
@example(
    # r7 16-msg mult-8 explore falsifier (the FOURTH void-family bug,
    # minimized): an untrusted CREATION-TOMBSTONE @7 (batch 0), a
    # trusted resurrection @14 (batch 1), then the key's REAL untrusted
    # creator @6 carrying a FILL (batch 2). In event order the @6
    # creation runs first, so the @7 tombstone is SKIPPED — its floor
    # never existed — and the creator's fill must survive under the
    # trusted @14 state. merge_batch's RESURRECTION baked the stored
    # tombstone's raw valid_from (7) into __floor_t / stored_floor and
    # cut the retro-creator's fill at 6. Fix: the tombstone contributes
    # its PRECEDENCE time (EPOCH-floored for a pure untrusted store —
    # which is necessarily a creation-tombstone, the only message that
    # ever acted) — item 37's floored-times-are-the-provenance rule
    # applied to mb's stored-floor baking sites.
    raw=[
        {"k": "x", "minute": 7, "a": None, "f": None, "tmode": "ignore",
         "dead": True, "trusted": False},
        {"k": "x", "minute": 14, "a": "a1", "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
        {"k": "x", "minute": 6, "a": None, "f": "f1", "tmode": "ignore",
         "dead": False, "trusted": False},
    ],
    split=[0, 1, 2],
)
@given(
    st.lists(mixed_msg_strategy, min_size=1, max_size=_MAX_MSGS),
    st.lists(st.integers(0, 2), min_size=2, max_size=8),
)
def test_mixed_trust_per_key_agrees_with_model(spark, raw, split):
    """Trust sampled per message: random splits through both merge
    granularities must still equal the sequential model (values +
    liveness — the cross-batch invariant)."""
    import itertools as it

    messages = []
    for i, r in enumerate(raw):
        t = {"ignore": Row(value=None, status="IGNORE"),
             "save1": Row(value="t1", status="SAVE"),
             "save2": Row(value="t2", status="SAVE"),
             "delete": Row(value=None, status="DELETE")}[r["tmode"]]
        messages.append(
            {
                "k": r["k"],
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": t,
                "dead": r["dead"] and i % 3 == 0,
                "trusted": r["trusted"],
            }
        )
    expected = model_fold_trusted(
        [{**m, "t": None if m["t"] is None else {"value": m["t"].value, "status": m["t"].status}}
         for m in messages]
    )
    batches = [[], [], []]
    for m, b in zip(messages, it.cycle(split)):
        batches[b].append(m)

    def run(merge):
        cur = None
        for bid, b in enumerate(batches):
            if not b:
                continue
            df = spark.createDataFrame([Row(**m) for m in b], TRUSTED_SCHEMA)
            cur = merge(cur, df, TRUSTED_SPEC, f"2024-06-01 00:00:{bid:02d}").current
            cur = cur.localCheckpoint()
        return {
            r.k: (r.a, r.f, r.t, r.valid_from)
            for r in cur.filter(~cur.is_deleted).collect()
        }

    assert_matches_model(run(merge_batch), expected)
    assert_matches_model(run(merge_batch_versions), expected)


def test_blocked_creator_leaves_no_phantom_audit(spark):
    """Deterministic pin of the ADVICE r4 corner (merge.py:700): a batch
    mixing an untrusted raw-first message with trusted messages over an
    EXISTING entity must behave exactly as sequential replay — the
    blocked creator's values must not turn a trusted no-op into a
    phantom audit row / validFrom advance, nor donate its
    first-contribution time to a real trusted change."""
    t0 = datetime.datetime(2024, 1, 1, 0, 10, 1)  # minute 10, seq/second 1

    def m(minute, seq, a, trusted):
        return Row(
            k="k", valid_from=datetime.datetime(2024, 1, 1, 0, minute, seq),
            seq=seq, a=a, f=None, t=Row(value=None, status="IGNORE"),
            dead=False, trusted=trusted,
        )

    for merge in (merge_batch, merge_batch_versions):
        # entity exists from a trusted write at minute 10
        r1 = merge(
            None, spark.createDataFrame([m(10, 1, "a1", True)], TRUSTED_SCHEMA),
            TRUSTED_SPEC, "2024-06-01 00:00:00",
        )
        # corner A: creator differs, trusted write is a NO-OP vs stored.
        # The creator sits at minute 15 — AFTER the key's first-ever
        # applied event (minute 10), so it is BLOCKED (an earlier
        # creator now legitimately retro-creates; see
        # test_early_creator_retro_creates below).
        b = spark.createDataFrame(
            [m(15, 2, "aX", False), m(20, 3, "a1", True)], TRUSTED_SCHEMA
        )
        r2 = merge(r1.current, b, TRUSTED_SPEC, "2024-06-01 00:00:01")
        rows = r2.live().collect()
        assert rows[0].a == "a1"
        assert rows[0].valid_from == t0, (merge.__name__, rows[0].valid_from)
        assert r2.audit.count() == 0, merge.__name__  # sequential = no-op

        # corner B: creator shares the trusted NEW value -> the change's
        # vf is the TRUSTED message's time, not the creator's
        b2 = spark.createDataFrame(
            [m(15, 4, "a2", False), m(20, 5, "a2", True)], TRUSTED_SCHEMA
        )
        r3 = merge(r1.current, b2, TRUSTED_SPEC, "2024-06-01 00:00:01")
        rows = r3.live().collect()
        assert rows[0].a == "a2"
        assert rows[0].valid_from == datetime.datetime(2024, 1, 1, 0, 20, 5), (
            merge.__name__, rows[0].valid_from,
        )
        assert r3.audit.count() == 1, merge.__name__  # the real change


def test_early_creator_retro_creates(spark):
    """r6: an untrusted message whose event time precedes EVERY event
    the key has ever applied retro-creates — in event-order replay it
    runs first, against no existing state, and the stored trusted
    writes re-apply on top (model_fold_trusted; found by the explore
    run as the mirror of the m6_tr_voids falsifier). The
    message-granularity path is event-order exact (the creator's
    version is audited away at the stored write's time); the
    entity-granularity path guarantees values + liveness."""
    t0 = datetime.datetime(2024, 1, 1, 0, 10, 1)

    def m(minute, seq, a, f, trusted):
        return Row(
            k="k", valid_from=datetime.datetime(2024, 1, 1, 0, minute, seq),
            seq=seq, a=a, f=f, t=Row(value=None, status="IGNORE"),
            dead=False, trusted=trusted,
        )

    for merge in (merge_batch, merge_batch_versions):
        r1 = merge(
            None,
            spark.createDataFrame([m(10, 1, "a1", None, True)], TRUSTED_SCHEMA),
            TRUSTED_SPEC, "2024-06-01 00:00:00",
        )
        # untrusted creator at minute 1 < first-ever event (minute 10):
        # it creates; its ASSIGN value is superseded by the stored
        # trusted write, but its FILL value fills the never-written slot
        b = spark.createDataFrame([m(1, 2, "aX", "f1", False)], TRUSTED_SCHEMA)
        r2 = merge(r1.current, b, TRUSTED_SPEC, "2024-06-01 00:00:01")
        rows = r2.live().collect()
        assert rows[0].a == "a1", merge.__name__   # trusted reasserts
        assert rows[0].f == "f1", merge.__name__   # creation fill lands
    # message granularity is event-order exact: the creator's version
    # exists and is superseded at the stored write's time
    aud = r2.audit.collect()
    assert [(x.a, x.valid_until) for x in aud] == [("aX", t0)]


def test_void_drops_mixed_store_untrusted_fill_and_tristate(spark):
    """An untrusted creation carrying a FILL and a TRISTATE, a later
    trusted write touching only ASSIGN, then an EARLIER untrusted
    retro-creator in a later batch: in event order the retro-creator
    creates, the stored creation is skipped, so its fill/tristate
    contributions must vanish while the trusted ASSIGN survives.

    (The r6 mult-8 explore-hunt falsifier, fixed in round 6: the stored
    row-level __untrusted flag is last-writer-level, so a MIXED
    incarnation read as trusted-origin and voids left the creation's
    TS_TRACKED contributions standing. Fix: per-field provenance is
    recovered from stored state — a TS_TRACKED field whose __ts sits at
    the UNTRUSTED_EPOCH floor was written by the untrusted creation
    (only creators write untrusted, and their write times are floored),
    and for an untrusted-created incarnation __first_t IS the creation's
    real event time. mbv marks floored pseudo seeds __unt so m6_keep
    drops them under a void; mb masks floored fields under
    partial_void.)"""
    t9 = Row(value="t9", status="SAVE")
    ign = Row(value=None, status="IGNORE")

    def m(minute, seq, a, f, t, trusted):
        return Row(
            k="x", valid_from=datetime.datetime(2024, 1, 1, 0, minute, seq),
            seq=seq, a=a, f=f, t=t, dead=False, trusted=trusted,
        )

    for merge in (merge_batch, merge_batch_versions):
        b0 = spark.createDataFrame(
            [m(7, 1, None, "f1", t9, False), m(26, 2, "a1", None, ign, True)],
            TRUSTED_SCHEMA,
        )
        r1 = merge(None, b0, TRUSTED_SPEC, "2024-06-01 00:00:00")
        b2 = spark.createDataFrame([m(0, 3, None, None, ign, False)], TRUSTED_SCHEMA)
        r2 = merge(r1.current, b2, TRUSTED_SPEC, "2024-06-01 00:00:02")
        rows = r2.current.filter("NOT is_deleted").collect()
        got = (rows[0].a, rows[0].f, rows[0].t)
        assert got == ("a1", None, None), (merge.__name__, got)


@settings(
    max_examples=_n(4),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(
    # delete + recreate: as-of inside the tombstone window must be empty
    raw=[
        {"k": "x", "minute": 5, "a": "a1", "f": "f1", "tmode": "save1", "dead": False},
        {"k": "x", "minute": 12, "a": None, "f": None, "tmode": "ignore", "dead": True},
        {"k": "x", "minute": 20, "a": "a2", "f": None, "tmode": "ignore", "dead": False},
    ],
)
@given(st.lists(msg_strategy, min_size=1, max_size=6))
def test_as_of_reconstruction_matches_model_at_every_time(spark, raw):
    """Q5 property (AuditCore.isValidAsOf semantics, informdb/
    AuditCore.java:83-97): within ONE batch the message-granularity fold
    is event-order exact, so as_of(current, audit, t) must equal the
    sequential model applied to exactly the messages at-or-before t —
    values, liveness AND valid_from — at every message timestamp and at
    midpoints between them."""
    import datetime as _dt

    from emap_spark.operators.merge import as_of

    messages = []
    for i, r in enumerate(raw):
        t = {"ignore": Row(value=None, status="IGNORE"),
             "save1": Row(value="t1", status="SAVE"),
             "save2": Row(value="t2", status="SAVE"),
             "delete": Row(value=None, status="DELETE")}[r["tmode"]]
        messages.append(
            {
                "k": r["k"],
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": t,
                "dead": r["dead"] and i % 3 == 0,
            }
        )
    df = spark.createDataFrame([Row(**m) for m in messages], SCHEMA)
    res = merge_batch_versions(None, df, SPEC, "2024-06-01 00:00:00")
    cur = res.current.localCheckpoint()
    aud = res.audit.localCheckpoint()

    plain = [
        {**m, "t": None if m["t"] is None else
         {"value": m["t"].value, "status": m["t"].status}}
        for m in messages
    ]
    times = sorted({m["valid_from"] for m in messages})
    probes = list(times)
    probes += [a + (b - a) / 2 for a, b in zip(times, times[1:])]
    probes.append(times[-1] + _dt.timedelta(minutes=1))
    for t in probes:
        got = {
            r.k: (r.a, r.f, r.t, r.valid_from)
            for r in as_of(cur, aud, t).collect()
        }
        expected = model_fold([m for m in plain if m["valid_from"] <= t])
        assert got == expected, f"as_of({t})"


@settings(
    max_examples=_n(4),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(
    # untrusted creation then trusted overwrite: as-of between them
    # must show the creation's values at the creation's REAL time
    raw=[
        {"k": "u", "minute": 3, "a": "a1", "f": "f1", "tmode": "save1",
         "dead": False, "trusted": False},
        {"k": "u", "minute": 20, "a": "a2", "f": None, "tmode": "ignore",
         "dead": False, "trusted": True},
    ],
)
@given(st.lists(mixed_msg_strategy, min_size=1, max_size=6))
def test_as_of_reconstruction_trusted_matches_model(spark, raw):
    """The as-of property under M6 trust (single batch, mixed per-message
    trust): skipped untrusted messages contribute no version, untrusted
    creations surface at their real event time, and every probe time
    reconstructs the sequential trusted model exactly."""
    import datetime as _dt

    from emap_spark.operators.merge import as_of

    messages = []
    for i, r in enumerate(raw):
        t = {"ignore": Row(value=None, status="IGNORE"),
             "save1": Row(value="t1", status="SAVE"),
             "save2": Row(value="t2", status="SAVE"),
             "delete": Row(value=None, status="DELETE")}[r["tmode"]]
        messages.append(
            {
                "k": r["k"],
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": t,
                "dead": r["dead"] and i % 3 == 0,
                "trusted": r["trusted"],
            }
        )
    df = spark.createDataFrame([Row(**m) for m in messages], TRUSTED_SCHEMA)
    res = merge_batch_versions(None, df, TRUSTED_SPEC, "2024-06-01 00:00:00")
    cur = res.current.localCheckpoint()
    aud = res.audit.localCheckpoint()

    plain = [
        {**m, "t": None if m["t"] is None else
         {"value": m["t"].value, "status": m["t"].status}}
        for m in messages
    ]
    times = sorted({m["valid_from"] for m in messages})
    probes = list(times)
    probes += [a + (b - a) / 2 for a, b in zip(times, times[1:])]
    probes.append(times[-1] + _dt.timedelta(minutes=1))
    for t in probes:
        got = {
            r.k: (r.a, r.f, r.t, r.valid_from)
            for r in as_of(cur, aud, t).collect()
        }
        expected = model_fold_trusted(
            [m for m in plain if m["valid_from"] <= t]
        )
        assert got == expected, f"as_of({t})"


def test_early_creator_voids_untrusted_creation_tombstone_floor(spark):
    """Minimized from the r6 16-message falsifier (fixed in round 6):
    b0 = untrusted creation-TOMBSTONE @7 + trusted a1 @21 (resurrects);
    b1 = untrusted retro-creator @6 carrying FILL f2. Event order:
    f2-creation @6, the @7 delete is SKIPPED (entity exists), trusted
    a1 @21 — final (a1, f2, None). An untrusted creation-tombstone may
    never cut anything (any earlier arrival proves the key existed
    first, so the delete was skipped), which is why mbv stores the
    floor at the tombstone's PRECEDENCE time — floored for untrusted
    creators, self-voiding — exactly as merge_batch's tomb_t already
    did (mb passed this test before the fix)."""
    ign = Row(value=None, status="IGNORE")

    def m(minute, seq, a, f, dead, trusted):
        return Row(
            k="x", valid_from=datetime.datetime(2024, 1, 1, 0, minute, seq),
            seq=seq, a=a, f=f, t=ign, dead=dead, trusted=trusted,
        )

    for merge in (merge_batch, merge_batch_versions):
        b0 = spark.createDataFrame(
            [m(7, 0, None, None, True, False), m(21, 1, "a1", None, False, True)],
            TRUSTED_SCHEMA,
        )
        r1 = merge(None, b0, TRUSTED_SPEC, "2024-06-01 00:00:00")
        b1 = spark.createDataFrame(
            [m(6, 2, None, "f2", False, False)], TRUSTED_SCHEMA
        )
        r2 = merge(r1.current, b1, TRUSTED_SPEC, "2024-06-01 00:00:01")
        rows = r2.current.filter("NOT is_deleted").collect()
        got = (rows[0].a, rows[0].f, rows[0].t)
        assert got == ("a1", "f2", None), (merge.__name__, got)
