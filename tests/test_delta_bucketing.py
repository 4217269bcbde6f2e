"""Key-bucketed DeltaLog base layout (VERDICT r3 next-step #3): the
compacted BASE — the only O(table-state) file — is hash-bucketed by key
(__kb = crc32(key) % n_buckets) and read_current(keys=...) prunes its
scan to the touched buckets off the manifest, so a micro-batch's seed
read costs O(touched base buckets + recent deltas), not O(table bytes),
and per-batch ingest cost stays flat as table state grows (the
reference never rereads its Postgres tables per message; RowState works
on per-key lookups, core/.../RowState.java:186-201). Deltas stay
unbucketed: they are O(touched keys) small by construction, so pruning
them buys nothing while a per-batch bucketing shuffle would tax every
commit."""

from __future__ import annotations

import datetime
import zlib

from pyspark.sql import Row, functions as F, types as T

from emap_spark.storage import DeltaLog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("valid_from", T.TimestampNTZType()),
        T.StructField("stored_from", T.TimestampNTZType()),
        T.StructField("is_deleted", T.BooleanType()),
        T.StructField("valid_until", T.TimestampNTZType()),
        T.StructField("stored_until", T.TimestampNTZType()),
        T.StructField("__rk", T.IntegerType()),
    ]
)

T0 = datetime.datetime(2024, 1, 1)


def _combined(spark, batch: int, n_keys: int = 40):
    rows = [
        Row(
            k=f"b{batch}-{i}",
            a=f"v{batch}",
            valid_from=T0 + datetime.timedelta(minutes=batch),
            stored_from=T0,
            is_deleted=False,
            valid_until=None,
            stored_until=None,
            __rk=1,
        )
        for i in range(n_keys)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_read_current_scans_only_touched_base_buckets(spark, tmp_path):
    log = DeltaLog(str(tmp_path / "t"), "t", ["k"], compact_every=4, n_buckets=8)
    log.load(spark)
    for b in range(4):  # 4th commit compacts -> bucketed base
        log.commit(b, _combined(spark, b))
    assert log._manifest["base"] is not None

    all_files = log.read_current().inputFiles()
    keys = spark.createDataFrame([Row(k="b2-7")], "k string")
    restricted = log.read_current(keys=keys)
    files = restricted.inputFiles()

    # the restricted scan enumerates ONLY the one base bucket the key
    # hashes into — never the other 7 buckets' files
    kbs = {f.split("__kb=")[1].split("/")[0] for f in files if "__kb=" in f}
    assert len(kbs) == 1, f"scan touched base buckets {kbs}"
    assert len(files) < len(all_files), (len(files), len(all_files))
    # and the read is still correct
    got = restricted.collect()
    assert len(got) == 1 and got[0].a == "v2"
    # the bucket id matches the engine's bucket function
    expected_kb = spark.createDataFrame([Row(k="b2-7")], "k string").select(
        log.bucket_expr().alias("kb")
    ).collect()[0].kb
    assert kbs == {str(expected_kb)}


def test_python_bucket_of_matches_spark_bucket_expr(spark, tmp_path):
    """The pipeline derives touched buckets driver-side with
    DeltaLog.bucket_of (zlib.crc32) — it must agree with the Spark-side
    bucket_expr for every key shape, including nulls and unicode."""
    log = DeltaLog(str(tmp_path / "t"), "t2", ["k1", "k2"], n_buckets=16)
    log.load(spark)
    rows = [
        ("abc", "def"), ("héllo€", ""), ("k\x1fx", "y"), ("12345", None),
        (None, None), ("", ""),
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    got = df.select("k1", "k2", log.bucket_expr().alias("kb")).collect()
    for r in got:
        assert log.bucket_of([r.k1, r.k2]) == r.kb, (r.k1, r.k2)


def test_python_bucket_of_bool_int_and_rejects_floats(spark, tmp_path):
    """ADVICE r4: Python str(True) is 'True' but Spark casts to 'true' —
    bucket_of must render Spark-style for bool/int keys and REJECT types
    whose rendering diverges (floats) instead of silently pruning to the
    wrong bucket."""
    import pytest

    log = DeltaLog(str(tmp_path / "t"), "t3", ["k1", "k2"], n_buckets=16)
    log.load(spark)
    df = spark.createDataFrame(
        [(True, 7), (False, -3), (None, 0)], "k1 boolean, k2 long"
    )
    got = df.select("k1", "k2", log.bucket_expr().alias("kb")).collect()
    for r in got:
        assert log.bucket_of([r.k1, r.k2]) == r.kb, (r.k1, r.k2)
    with pytest.raises(TypeError, match="string/int/bool"):
        log.bucket_of([1.5])


def test_touched_bucket_read_stays_flat_as_state_grows(spark, tmp_path):
    """10x more table state must not grow the bytes a keyed read scans:
    the per-key file count is bounded by one base bucket + the
    <= compact_every live deltas, independent of how many other keys
    exist in the table."""
    log = DeltaLog(str(tmp_path / "t"), "t", ["k"], compact_every=4, n_buckets=8)
    log.load(spark)
    for b in range(12):  # grows state >10x, crosses 3 compactions
        log.commit(b, _combined(spark, b))

    keys = spark.createDataFrame([Row(k="b0-0")], "k string")
    files = log.read_current(keys=keys).inputFiles()
    base_files = [f for f in files if "/base/" in f]
    # base contribution: ONE bucket's file(s), not the whole 8-bucket base
    kbs = {f.split("__kb=")[1].split("/")[0] for f in base_files}
    assert len(kbs) == 1, kbs
    # total bounded by one base bucket + live deltas — flat in state size
    assert len(files) <= log.compact_every + 1, files

    # correctness across compaction + pruning: every key still current
    assert log.read_current().count() == 12 * 40
    got = log.read_current(keys=keys).collect()
    assert len(got) == 1 and got[0].a == "v0"


def test_bucketed_matches_unbucketed(spark, tmp_path):
    """Differential: the bucketed layout is an optimization, not a
    semantics change — full and keyed reads agree with n_buckets=0."""
    logb = DeltaLog(str(tmp_path / "b"), "t", ["k"], compact_every=3, n_buckets=8)
    logu = DeltaLog(str(tmp_path / "u"), "t", ["k"], compact_every=3, n_buckets=0)
    logb.load(spark)
    logu.load(spark)
    for b in range(5):
        logb.commit(b, _combined(spark, b, n_keys=10))
        logu.commit(b, _combined(spark, b, n_keys=10))
    snap = lambda df: sorted((r.k, r.a) for r in df.collect())
    assert snap(logb.read_current()) == snap(logu.read_current())
    keys = spark.createDataFrame([Row(k="b2-3"), Row(k="b4-9")], "k string")
    assert snap(logb.read_current(keys=keys)) == snap(logu.read_current(keys=keys))
    # precomputed-bucket path (the pipeline's) agrees too
    buckets = sorted({logb.bucket_of(["b2-3"]), logb.bucket_of(["b4-9"])})
    assert snap(logb.read_current(keys=keys, buckets=buckets)) == snap(
        logu.read_current(keys=keys)
    )


def test_existing_table_keeps_its_layout(spark, tmp_path):
    """n_buckets is a table property recorded at creation: reopening an
    unbucketed table with a bucketed constructor must NOT mix layouts."""
    log0 = DeltaLog(str(tmp_path / "t"), "t", ["k"], n_buckets=0)
    log0.load(spark)
    log0.commit(0, _combined(spark, 0, n_keys=5))

    reopened = DeltaLog(str(tmp_path / "t"), "t", ["k"], n_buckets=16)
    reopened.load(spark)
    assert reopened.n_buckets == 0
    reopened.commit(1, _combined(spark, 1, n_keys=5))
    assert reopened.read_current().count() == 10
