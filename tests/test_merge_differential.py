"""Differential/generative testing of the merge engine (the reference's
PermutationTestCase §5.3 technique, upgraded): hypothesis generates
random message sequences; a pure-Python sequential-application model
(one message at a time, exactly the reference's processing style)
computes the expected state; merge_batch folding the whole set at once
must agree.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, types as T

from emap_spark.operators.merge import ASSIGN, FILL_IF_NULL, TRISTATE, MergeSpec, merge_batch

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


def model_fold(messages):
    """Reference-style sequential application in (valid_from, seq) order."""
    state: dict[str, dict] = {}
    for m in sorted(messages, key=lambda m: (m["valid_from"], m["seq"])):
        k = m["k"]
        if m["dead"]:
            state[k] = {"deleted": True, "a": None, "f": None, "t": None, "vf": m["valid_from"]}
            continue
        cur = state.get(k)
        if cur is None or cur["deleted"]:
            cur = {"deleted": False, "a": None, "f": None, "t": None, "vf": None}
            state[k] = cur
        # sequential: each message is newer than current by construction
        cur["a"] = m["a"]  # ASSIGN carries even nulls
        if m["f"] is not None:
            cur["f"] = m["f"]
        ts = m["t"]
        if ts is not None and ts["status"] == "SAVE":
            cur["t"] = ts["value"]
        elif ts is not None and ts["status"] == "DELETE":
            cur["t"] = None
        cur["vf"] = m["valid_from"]
        cur["deleted"] = False
    return {
        k: (v["a"], v["f"], v["t"], v["vf"])
        for k, v in state.items()
        if not v["deleted"]
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
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(msg_strategy, min_size=1, max_size=8))
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
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(msg_strategy, min_size=2, max_size=8),
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
    assert snap_state(cur) == expected

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
    assert snap_state(delta.read_current()) == expected
    assert snap_state(snapshot.read_current()) == expected
