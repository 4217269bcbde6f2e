"""Merge-engine semantics tests, modeled on the reference's test strategy
(SURVEY.md §5): permutation (order-invariance) tests, batch-split
invariance, per-policy behavior, audit/as-of reconstruction."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row, functions as F, types as T

from emap_spark.operators.merge import (
    ASSIGN,
    FILL_IF_NULL,
    TRISTATE,
    MergeSpec,
    as_of,
    merge_batch,
    replay,
)

SCHEMA = T.StructType(
    [
        T.StructField("mrn", T.StringType()),
        T.StructField("valid_from", T.TimestampNTZType()),
        T.StructField("seq", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("nhs_number", T.StringType()),
        T.StructField(
            "comment",
            T.StructType(
                [T.StructField("value", T.StringType()), T.StructField("status", T.StringType())]
            ),
        ),
        T.StructField("trusted", T.BooleanType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)

SPEC = MergeSpec(
    key=["mrn"],
    fields={"name": ASSIGN, "nhs_number": FILL_IF_NULL, "comment": TRISTATE},
    event_time="valid_from",
    seq="seq",
    trusted="trusted",
    tombstone="deleted",
)

import datetime


def ts(day: int, hour: int = 0):
    return datetime.datetime(2024, 1, day, hour)


def msg(mrn, day, seq, name=None, nhs=None, comment=None, comment_status=None,
        trusted=True, deleted=False):
    cval = None
    if comment is not None or comment_status is not None:
        cval = Row(value=comment, status=comment_status or ("SAVE" if comment else "IGNORE"))
    return Row(
        mrn=mrn, valid_from=ts(day), seq=seq, name=name, nhs_number=nhs,
        comment=cval, trusted=trusted, deleted=deleted,
    )


def run(spark, messages, batches=None):
    if batches is None:
        df = spark.createDataFrame(messages, SCHEMA)
        return merge_batch(None, df, SPEC, "2024-06-01 00:00:00")
    frames = [spark.createDataFrame(b, SCHEMA) for b in batches]
    return replay(frames, SPEC, ["2024-06-01 00:00:00"] * len(frames))


def snapshot(result):
    rows = result.live().collect()
    return sorted(
        (r.mrn, r.name, r.nhs_number, r.comment, r.valid_from) for r in rows
    )


BASE_MSGS = [
    msg("a", 1, 1, name="Alice", comment="first"),
    msg("a", 2, 2, name="Alicia", nhs="N1"),
    msg("a", 3, 3, name="Alice B", comment='x', comment_status="DELETE"),
]


def test_newer_wins_and_fill(spark):
    res = run(spark, BASE_MSGS)
    snap = snapshot(res)
    assert len(snap) == 1
    mrn, name, nhs, comment, vf = snap[0]
    assert name == "Alice B"  # ASSIGN: newest message wins (M4)
    assert nhs == "N1"  # FILL: older non-null retained (M5)
    assert comment is None  # TRISTATE DELETE erased it (M3/M8)
    assert vf == ts(3)


def test_permutation_invariance(spark):
    expected = snapshot(run(spark, BASE_MSGS))
    for perm in itertools.permutations(BASE_MSGS):
        assert snapshot(run(spark, list(perm))) == expected, perm


def test_batch_split_invariance(spark):
    expected = snapshot(run(spark, BASE_MSGS))
    m = BASE_MSGS
    splits = [[m], [m[:1], m[1:]], [m[:2], m[2:]], [[m[0]], [m[1]], [m[2]]],
              [[m[2]], [m[0]], [m[1]]]]  # includes out-of-order batch arrival
    for batches in splits:
        assert snapshot(run(spark, None, batches=batches)) == expected


def test_ignore_does_not_touch(spark):
    msgs = [
        msg("a", 1, 1, name="A", comment="keep"),
        msg("a", 2, 2, name="B"),  # comment IGNORE
    ]
    snap = snapshot(run(spark, msgs))
    assert snap[0][3] == "keep"


def test_untrusted_creates_but_never_overwrites(spark):
    msgs = [
        msg("a", 1, 1, name="from-untrusted", trusted=False),
        msg("a", 2, 2, name="untrusted-2", trusted=False),
    ]
    snap = snapshot(run(spark, msgs))
    assert snap[0][1] == "from-untrusted"  # earliest untrusted creates (M6)

    msgs2 = msgs + [msg("a", 3, 3, name="epic", trusted=True)]
    snap2 = snapshot(run(spark, msgs2))
    assert snap2[0][1] == "epic"  # trusted overwrites

    # untrusted arriving after a trusted entity exists: no effect
    res = run(spark, None, batches=[[msg("a", 1, 1, name="epic")],
                                    [msg("a", 5, 2, name="untrusted", trusted=False)]])
    assert snapshot(res)[0][1] == "epic"


def test_tombstone_delete_and_resurrect(spark):
    # delete hides the entity
    res = run(spark, [msg("a", 1, 1, name="A"), msg("a", 2, 2, deleted=True)])
    assert snapshot(res) == []
    # an OLDER message after the delete cannot resurrect (order-invariant M9)
    res2 = run(spark, None, batches=[
        [msg("a", 1, 1, name="A"), msg("a", 3, 2, deleted=True)],
        [msg("a", 2, 3, name="late-old")],
    ])
    assert snapshot(res2) == []
    # a NEWER message recreates fresh (no field inheritance)
    res3 = run(spark, None, batches=[
        [msg("a", 1, 1, name="A", nhs="N1"), msg("a", 2, 2, deleted=True)],
        [msg("a", 3, 3, name="B")],
    ])
    snap = snapshot(res3)
    assert len(snap) == 1 and snap[0][1] == "B" and snap[0][2] is None


def test_audit_and_asof(spark):
    res = run(spark, None, batches=[[BASE_MSGS[0]], [BASE_MSGS[1]], [BASE_MSGS[2]]])
    audit = res.audit.collect()
    # two supersessions -> two audit rows with correct validity intervals
    assert len(audit) == 2
    intervals = sorted((a.valid_from, a.valid_until) for a in audit)
    assert intervals == [(ts(1), ts(2)), (ts(2), ts(3))]
    # as-of day 2 (hospital time): sees the day-2 version
    state = as_of(res.current, res.audit, ts(2, 12)).collect()
    assert len(state) == 1 and state[0].name == "Alicia"
    # as-of day 1: original version
    state1 = as_of(res.current, res.audit, ts(1, 12)).collect()
    assert len(state1) == 1 and state1[0].name == "Alice"
    # before any knowledge: empty
    assert as_of(res.current, res.audit, ts(1) - datetime.timedelta(days=1)).count() == 0


def test_two_entities_independent(spark):
    msgs = [msg("a", 1, 1, name="A"), msg("b", 2, 2, name="B", nhs="NB")]
    snap = snapshot(run(spark, msgs))
    assert [s[0] for s in snap] == ["a", "b"]


def test_untrusted_creation_exposes_real_valid_from(spark):
    """Advice round 2 #2: the UNTRUSTED_EPOCH precedence floor is merge
    metadata only — an untrusted-created row exposes the message's REAL
    validFrom in table()/live() and in as_of, exactly as the reference
    stores it; precedence (any trusted write supersedes) is unchanged."""
    res = run(spark, [msg("a", 5, 1, name="from-untrusted", trusted=False)])
    snap = snapshot(res)
    assert snap[0][1] == "from-untrusted"
    assert snap[0][4] == ts(5)  # real event time, not 1800-01-01
    # as_of before the real validFrom: the entity does not exist yet
    assert as_of(res.current, res.audit, ts(4)).count() == 0
    assert as_of(res.current, res.audit, ts(5, 1)).count() == 1

    # an OLDER trusted write still supersedes the untrusted creation
    # (M6 precedence floor), in both granularities and either order
    from emap_spark.operators.merge import merge_batch_versions

    for granularity in ("batch", "message"):
        merge = merge_batch if granularity == "batch" else merge_batch_versions
        cur = None
        for batch in (
            [msg("a", 5, 1, name="from-untrusted", trusted=False)],
            [msg("a", 2, 2, name="epic-older", trusted=True)],
        ):
            r = merge(cur, spark.createDataFrame(batch, SCHEMA), SPEC,
                      "2024-06-01 00:00:00")
            cur = r.current
        rows = r.live().collect()
        assert rows[0].name == "epic-older", granularity
        assert rows[0].valid_from == ts(2), granularity


def test_fill_legacy_frame_rejects_older(spark):
    """ADVICE r4 (medium): a legacy pre-metadata current frame (tolerated
    via null __ts_<field> columns) must treat a POPULATED fill slot as
    written at the entity valid_from — an OLDER out-of-order message may
    not overwrite it (merge_batch_versions already fell back via the
    pseudo-seed coalesce(__ts, valid_from); merge_batch now mirrors it)."""
    legacy_schema = T.StructType(
        [
            T.StructField("mrn", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("nhs_number", T.StringType()),
            T.StructField("comment", T.StringType()),
            T.StructField("valid_from", T.TimestampNTZType()),
            T.StructField("stored_from", T.TimestampNTZType()),
            T.StructField("is_deleted", T.BooleanType()),
        ]
    )
    legacy = spark.createDataFrame(
        [
            Row(
                mrn="a", name="Alice", nhs_number="N1", comment=None,
                valid_from=ts(5), stored_from=ts(5), is_deleted=False,
            )
        ],
        legacy_schema,
    )
    older = spark.createDataFrame([msg("a", 1, 1, nhs="OLD")], SCHEMA)
    res = merge_batch(legacy, older, SPEC, "2024-06-01 00:00:00")
    row = res.live().collect()[0]
    assert row.nhs_number == "N1"  # older message must NOT fill over

    # a NEWER message still overwrites the legacy slot (fill-if-newer)
    newer = spark.createDataFrame([msg("a", 6, 2, nhs="NEW")], SCHEMA)
    res2 = merge_batch(legacy, newer, SPEC, "2024-06-01 00:00:00")
    assert res2.live().collect()[0].nhs_number == "NEW"

    # an empty legacy slot still accepts any age (fill-if-null)
    legacy_null = spark.createDataFrame(
        [
            Row(
                mrn="a", name="Alice", nhs_number=None, comment=None,
                valid_from=ts(5), stored_from=ts(5), is_deleted=False,
            )
        ],
        legacy_schema,
    )
    res3 = merge_batch(legacy_null, older, SPEC, "2024-06-01 00:00:00")
    assert res3.live().collect()[0].nhs_number == "OLD"


def test_trusted_merge_batch_codegen_compiles(spark, capfd):
    """r6 ledger item 35 / VERDICT r6 #6: the trusted-precedence
    templates used to overflow Janino's 64 KB method limit (whole stage
    silently fell back to interpreted mode — a latent 10x). The helper
    tiers + the filter-free audit/combined views must keep every
    generated method compiling; the JVM's 'Failed to compile' ERROR on
    stderr is the regression signal (capfd sees the JVM fd)."""
    from emap_spark.lineage import cut

    msgs = [
        msg("a", 1, 1, name="n1", trusted=False),
        msg("a", 2, 2, name="n2", trusted=True),
        msg("b", 1, 3, name="n3", trusted=True, deleted=True),
        msg("b", 2, 4, name="n4", trusted=False),
    ]
    df = spark.createDataFrame(msgs, SCHEMA)
    capfd.readouterr()  # drain earlier tests' output
    res = merge_batch(None, df, SPEC, "2024-06-01 00:00:00")
    assert res.combined.count() == 2 and res.audit.count() == 0
    cur = cut(res.current)
    res2 = merge_batch(cur, df, SPEC, "2024-06-02 00:00:00")
    assert res2.combined.count() == 2 and res2.audit.count() == 0
    assert [
        (r.mrn, r.name) for r in res2.live().select("mrn", "name").collect()
    ] == [("a", "n2")]
    out = capfd.readouterr()
    joined = out.err + out.out
    assert "Failed to compile" not in joined, joined[-2000:]
