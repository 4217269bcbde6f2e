"""D2/D3/D18: identity merge closure and opt-out propagation
(PersonController.mergeMrns :93-131, updateMrnToLiveIfMessageIsNotBefore
:133-152, updateOrCreateWithResearchOptOut :69-81).

MergePatient (A40) repoints every MRN in the losing chain to the
surviving MRN. Chains of merges require a transitive closure — computed
by pointer doubling: O(log chain-length) self-joins of the
dimension-sized mapping, the one sanctioned driver loop (SURVEY §4
custom piece 5).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from emap_spark.lineage import cut


def resolve_identity(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges: (retired, survivor) merge pairs. Returns (mrn, live_mrn)
    for every mrn appearing anywhere, with chains fully collapsed.

    Pointer doubling bounded by ceil(log2(n)) + 1 (a chain cannot be
    longer than the node count); each iteration cuts lineage via a
    parquet roundtrip (see emap_spark.lineage for why not
    localCheckpoint) and exits early once the mapping stabilizes.

    Cycle tiebreak: mutual/circular merges have no well-defined
    survivor, so every member of a cycle-tainted component resolves to
    the component's smallest member (keeps mrn_to_live / opt-out
    propagation on ONE live mrn per identity group).
    """
    edges = edges.filter(
        F.col("retired").isNotNull()
        & F.col("survivor").isNotNull()
        & (F.col("retired") != F.col("survivor"))
    ).groupBy("retired").agg(F.min("survivor").alias("survivor"))
    nodes = (
        edges.select(F.col("retired").alias("u"))
        .unionByName(edges.select(F.col("survivor").alias("u")))
        .distinct()
    )
    m = cut(
        nodes.join(edges, nodes.u == edges.retired, "left").select(
            "u", F.coalesce(F.col("survivor"), F.col("u")).alias("live")
        )
    )
    n = m.count()
    bound = min(max_iter, math.ceil(math.log2(n + 1)) + 1) if n else 0
    for _ in range(bound):
        prev = m
        m = cut(
            m.alias("a")
            .join(m.alias("b"), F.col("a.live") == F.col("b.u"))
            .select(
                F.col("a.u").alias("u"),
                # cycle guard: never hop back onto yourself
                F.when(F.col("b.live") == F.col("a.u"), F.col("a.live"))
                .otherwise(F.col("b.live"))
                .alias("live"),
            )
        )
        changed = not m.alias("x").join(
            prev.alias("y"),
            (F.col("x.u") == F.col("y.u")) & (F.col("x.live") != F.col("y.live")),
            "left_semi",
        ).isEmpty()
        if not changed:
            break

    # Cycle canonicalization: an acyclic converged mapping is idempotent
    # (live(live(u)) == live(u)). With the hop guard above, every node in
    # (or pointing transitively into) a merge cycle keeps an unstable
    # 2-hop image, so `flagged` is exactly the cycle-tainted node set —
    # tiny in practice (cycles are degenerate input). Min-label
    # propagation restricted to the flagged subgraph canonicalizes each
    # such component to its smallest member; acyclic chains keep their
    # true survivor.
    two_hop = (
        m.alias("a")
        .join(m.alias("b"), F.col("a.live") == F.col("b.u"))
        .select(
            F.col("a.u").alias("u"),
            F.col("a.live").alias("live"),
            F.col("b.live").alias("live2"),
        )
    )
    flagged = two_hop.filter(F.col("live") != F.col("live2")).select("u")
    if not flagged.isEmpty():
        flagged = cut(flagged)
        mf = m.join(flagged, "u", "left_semi")
        sym = cut(
            mf.select(F.col("u").alias("x"), F.col("live").alias("y"))
            .unionByName(mf.select(F.col("live").alias("x"), F.col("u").alias("y")))
            .filter(F.col("x") != F.col("y"))
            .distinct()
        )
        lab = mf.select("u", F.least("u", "live").alias("lab"))
        for _ in range(max_iter):
            neigh = sym.join(lab, sym["y"] == lab["u"]).select(
                sym["x"].alias("u"), F.col("lab")
            )
            prev_lab = lab
            lab = cut(
                lab.unionByName(neigh).groupBy("u").agg(F.min("lab").alias("lab"))
            )
            changed = not lab.alias("x").join(
                prev_lab.alias("y"),
                (F.col("x.u") == F.col("y.u")) & (F.col("x.lab") != F.col("y.lab")),
                "left_semi",
            ).isEmpty()
            if not changed:
                break
        m = m.join(lab, "u", "left").select(
            "u", F.coalesce(F.col("lab"), F.col("live")).alias("live")
        )
    return m.select(F.col("u").alias("mrn"), F.col("live").alias("live_mrn"))


def mrn_to_live(all_mrns: DataFrame, merge_messages: DataFrame) -> DataFrame:
    """Full MrnToLive table: every known mrn -> its live mrn (self when
    never merged). merge_messages: (retired_mrn, mrn) from A40s."""
    edges = merge_messages.select(
        F.col("retired_mrn").alias("retired"), F.col("mrn").alias("survivor")
    ).filter(F.col("retired").isNotNull() & F.col("survivor").isNotNull())
    resolved = resolve_identity(edges)
    return (
        all_mrns.select(F.col("mrn"))
        .distinct()
        .join(resolved, "mrn", "left")
        .select("mrn", F.coalesce("live_mrn", F.col("mrn")).alias("live_mrn"))
    )


def propagate_opt_out(mrn_table: DataFrame, to_live: DataFrame) -> DataFrame:
    """D18: researchOptOut is OR-propagated across a merged identity set
    (opting out any member opts out the whole person)."""
    joined = mrn_table.join(to_live, "mrn", "left").withColumn(
        "live_mrn", F.coalesce("live_mrn", F.col("mrn"))
    )
    flags = joined.groupBy("live_mrn").agg(
        F.max(F.coalesce(F.col("research_opt_out"), F.lit(False))).alias("group_opt_out")
    )
    return (
        joined.join(flags, "live_mrn")
        .drop("research_opt_out")
        .withColumnRenamed("group_opt_out", "research_opt_out")
    )


def apply_identifier_changes(mrn_table: DataFrame, changes: DataFrame) -> DataFrame:
    """D3: ChangePatientIdentifiers (A47) — rekey an MRN with
    colliding-target checks (PersonController.updatePatientIdentifiersOrMerge
    :382). changes: (old_mrn, new_mrn).

    A change whose target already exists is a collision and is NOT
    applied (the reference escalates those to a merge); collisions are
    returned untouched so callers can route them to the merge path.
    """
    existing = mrn_table.select(F.col("mrn").alias("new_mrn")).distinct()
    safe = changes.join(existing, "new_mrn", "left_anti")
    renamed = (
        mrn_table.join(safe, mrn_table.mrn == safe.old_mrn, "left")
        .withColumn("mrn", F.coalesce(F.col("new_mrn"), F.col("mrn")))
        .drop("old_mrn", "new_mrn")
    )
    return renamed


def move_visit(visit_table: DataFrame, moves: DataFrame) -> DataFrame:
    """D3: MoveVisitInformation (A45) — move an encounter between MRNs
    (VisitController.moveVisitInformation :289-325). moves:
    (encounter, to_mrn)."""
    m = moves.select(F.col("encounter").alias("mv_enc"), "to_mrn")
    return (
        visit_table.join(m, visit_table.encounter == m.mv_enc, "left")
        .withColumn("mrn", F.coalesce(F.col("to_mrn"), F.col("mrn")))
        .drop("mv_enc", "to_mrn")
    )
