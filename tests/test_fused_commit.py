"""Fused multi-table commit (VERDICT r4 #1): one Spark write action
commits every table's row versions for a batch — the analogue of the
reference committing all of a message's tables in one transaction
(core/.../App.java:92-101). Correctness bar: byte-identical table state
vs per-table commits, exactly-once under partial-crash replay, and the
table read surface must NOT leak other tables' superset columns."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import Row, functions as F, types as T

from emap_spark.storage import DeltaLog
from emap_spark.storage.delta import commit_fused

T0 = datetime.datetime(2024, 1, 1)


def _schema(fields: dict[str, str]) -> T.StructType:
    base = [
        ("k", "string"), *fields.items(),
        ("valid_from", "ts"), ("stored_from", "ts"), ("is_deleted", "bool"),
        ("valid_until", "ts"), ("stored_until", "ts"), ("__rk", "int"),
    ]
    m = {"string": T.StringType(), "ts": T.TimestampNTZType(),
         "bool": T.BooleanType(), "int": T.IntegerType(), "long": T.LongType()}
    return T.StructType([T.StructField(n, m[t]) for n, t in base])


VIS = _schema({"bed": "string"})
DEM = _schema({"name": "string", "age": "long"})


def _rows(spark, schema, batch: int, n: int, **vals):
    field_names = [f.name for f in schema.fields]
    rows = []
    for i in range(n):
        d = dict.fromkeys(field_names)
        d.update(
            k=f"k{i}",
            valid_from=T0 + datetime.timedelta(minutes=batch),
            stored_from=T0, is_deleted=False, __rk=1,
        )
        for name, v in vals.items():
            d[name] = f"{v}{batch}" if isinstance(v, str) else v
        rows.append(Row(**d))
    return spark.createDataFrame(rows, schema)


def _mk_logs(tmp_path, compact_every=8):
    a = DeltaLog(str(tmp_path / "f"), "visits", ["k"], compact_every=compact_every)
    b = DeltaLog(str(tmp_path / "f"), "demog", ["k"], compact_every=compact_every)
    return a, b


def test_fused_matches_per_table_and_prunes_schema(spark, tmp_path):
    la, lb = _mk_logs(tmp_path / "fused")
    pa, pb = _mk_logs(tmp_path / "plain")
    for log in (la, lb, pa, pb):
        log.load(spark)

    for batch in range(3):
        va = _rows(spark, VIS, batch, 5, bed="bed")
        vb = _rows(spark, DEM, batch, 4, name="nm", age=30 + batch)
        n = commit_fused(batch, {"visits": (la, va), "demog": (lb, vb)})
        assert n >= 1
        pa.commit(batch, va)
        pb.commit(batch, vb)

    # ONE shared fused file per batch, partitioned by table
    froot = la.fused_root()
    assert sorted(os.listdir(froot)) == ["batch=0", "batch=1", "batch=2"]
    parts = [
        d for d in os.listdir(os.path.join(froot, "batch=0"))
        if d.startswith("__tbl=")
    ]
    assert sorted(parts) == ["__tbl=demog", "__tbl=visits"]

    for fused, plain in ((la, pa), (lb, pb)):
        f, p = fused.read_current(), plain.read_current()
        # the read surface is exactly the table schema — no superset leak
        assert f.columns == p.columns, (f.columns, p.columns)
        assert sorted(map(tuple, f.collect())) == sorted(map(tuple, p.collect()))
        fa, pa_ = fused.read_audit(), plain.read_audit()
        assert sorted(map(tuple, fa.collect())) == sorted(map(tuple, pa_.collect()))


def test_fused_partial_crash_replay_is_exactly_once(spark, tmp_path):
    la, lb = _mk_logs(tmp_path)
    la.load(spark), lb.load(spark)
    va = _rows(spark, VIS, 0, 3, bed="bed")
    vb = _rows(spark, DEM, 0, 3, name="nm", age=40)

    # simulate a crash AFTER table A registered batch 0 but before B did:
    # A commits alone, then the replay fuses both — only B is pending
    la.commit(0, va)
    before = sorted(map(tuple, la.read_current().collect()))
    n = commit_fused(0, {"visits": (la, va), "demog": (lb, vb)})
    assert n >= 1
    assert sorted(map(tuple, la.read_current().collect())) == before  # untouched
    assert lb.read_current().count() == 3
    # full replay of a fully-committed batch is a no-op
    assert commit_fused(0, {"visits": (la, va), "demog": (lb, vb)}) == 0

    # a second fused write for a batch id never overwrites an attempt
    # dir that registered tables point into (fresh .rN attempt dir)
    lc = DeltaLog(str(tmp_path / "f"), "third", ["k"], compact_every=8)
    lc.load(spark)
    vc = _rows(spark, VIS, 0, 2, bed="x")
    commit_fused(0, {"visits": (la, va), "third": (lc, vc)})
    assert lc.read_current().count() == 2
    assert sorted(map(tuple, la.read_current().collect())) == before


def test_fused_compaction_cleans_shared_dirs(spark, tmp_path):
    la, lb = _mk_logs(tmp_path, compact_every=3)
    la.load(spark), lb.load(spark)
    for batch in range(3):  # 3rd commit compacts both tables
        commit_fused(batch, {
            "visits": (la, _rows(spark, VIS, batch, 4, bed="bed")),
            "demog": (lb, _rows(spark, DEM, batch, 4, name="nm", age=1)),
        })
    assert la._manifest["base"] is not None
    assert lb._manifest["base"] is not None
    # every fused partition was folded into the per-table bases and the
    # shared batch dirs are gone
    froot = la.fused_root()
    assert not os.path.isdir(froot) or os.listdir(froot) == []
    # reads still correct post-compaction
    assert la.read_current().count() == 4
    assert [r.bed for r in lb.read_current().limit(0).collect()] == []
    assert la.read_current().columns == [
        f.name for f in VIS.fields if f.name not in ("valid_until", "stored_until", "__rk")
    ]


def test_fused_type_conflict_falls_back_per_table(spark, tmp_path):
    """Same column name, different type across tables -> cannot union:
    commit_fused must fall back to correct per-table commits."""
    la = DeltaLog(str(tmp_path / "f"), "t1", ["k"], compact_every=8)
    lb = DeltaLog(str(tmp_path / "f"), "t2", ["k"], compact_every=8)
    la.load(spark), lb.load(spark)
    sa = _schema({"x": "string"})
    sb = _schema({"x": "long"})
    va = _rows(spark, sa, 0, 2, x="s")
    vb = _rows(spark, sb, 0, 2, x=9)
    n = commit_fused(0, {"t1": (la, va), "t2": (lb, vb)})
    assert n == 2  # two separate writes
    assert not os.path.isdir(la.fused_root()) or os.listdir(la.fused_root()) == []
    assert [r.x for r in la.read_current().limit(1).collect()] == ["s0"]
    assert [r.x for r in lb.read_current().limit(1).collect()] == [9]
