"""P7 blue/green schema swap (Technical_overview_of_EMAP.md:136-140:
star_a / star_b + a `star` synonym switched at cutover): the alias swap
is a catalog-only operation — new readers see the fresh side
immediately, readers planned before the swap keep their bound side
(immutable files), and a restarted session re-attaches to the recorded
active side."""

from __future__ import annotations

from pyspark.sql import Row

from emap_spark.storage.bluegreen import BlueGreenCatalog


def test_swap_is_atomic_and_never_interrupts_readers(spark, tmp_path):
    cat = BlueGreenCatalog(spark, str(tmp_path), name="star")
    assert cat.active_side() is None
    assert cat.inactive_side() == "a"

    v1 = spark.createDataFrame([Row(id=1, v="blue")])
    cat.publish("a", {"visits": v1})
    cat.swap("a")
    assert cat.active_side() == "a"
    assert cat.inactive_side() == "b"
    assert [r.v for r in cat.table("visits").collect()] == ["blue"]
    assert [r.v for r in spark.sql("SELECT v FROM star_visits").collect()] == ["blue"]

    # a reader that planned BEFORE the cutover keeps its bound side
    old_reader = cat.table("visits")

    v2 = spark.createDataFrame([Row(id=1, v="green"), Row(id=2, v="green")])
    cat.publish("b", {"visits": v2})  # offline rebuild: readers unaffected
    assert old_reader.count() == 1
    cat.swap("b")

    assert sorted(r.v for r in cat.table("visits").collect()) == ["green", "green"]
    # the pre-swap reader still resolves to the blue side's files
    assert [r.v for r in old_reader.collect()] == ["blue"]


def test_snapshot_is_side_consistent(spark, tmp_path):
    """ADVICE r4: alias-view atomicity is per view, so multi-table
    consistency across a concurrent cutover comes from snapshot() — one
    pointer read binds EVERY table to the same side, and the bound side's
    files survive the swap."""
    cat = BlueGreenCatalog(spark, str(tmp_path), name="star3")
    cat.publish("a", {
        "fact": spark.createDataFrame([Row(id=1, side="a")]),
        "dim": spark.createDataFrame([Row(id=1, side="a")]),
    })
    cat.swap("a")
    snap = cat.snapshot()
    assert set(snap) == {"fact", "dim"}

    cat.publish("b", {
        "fact": spark.createDataFrame([Row(id=1, side="b")]),
        "dim": spark.createDataFrame([Row(id=1, side="b")]),
    })
    cat.swap("b")
    # the pre-swap snapshot still reads side a for BOTH tables
    assert {r.side for r in snap["fact"].collect()} == {"a"}
    assert {r.side for r in snap["dim"].collect()} == {"a"}
    # a fresh snapshot reads side b for both
    snap2 = cat.snapshot()
    assert {r.side for r in snap2["fact"].collect()} == {"b"}
    assert {r.side for r in snap2["dim"].collect()} == {"b"}


def test_restart_reattaches_active_side(spark, tmp_path):
    cat = BlueGreenCatalog(spark, str(tmp_path), name="star2")
    cat.publish("a", {"beds": spark.createDataFrame([Row(n=1)])})
    cat.swap("a")
    cat.publish("b", {"beds": spark.createDataFrame([Row(n=2), Row(n=3)])})
    cat.swap("b")

    fresh = BlueGreenCatalog(spark, str(tmp_path), name="star2")
    assert fresh.active_side() == "b"
    fresh.attach()
    assert fresh.table("beds").count() == 2
