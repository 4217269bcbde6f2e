"""Continuous-ingestion corpus dedup: the q113 batch-vs-corpus decision
as a foreachBatch-able component with a DURABLE index.

Every incoming micro-batch of documents is near-dup-checked against the
standing corpus and the survivors join the corpus — the loop a
continuous training-data pipeline runs forever. Two persisted tables
make the per-batch cost independent of corpus size at the shuffle
level:

- ``<name>_bands``: the corpus LSH band index, BUCKETED BY bkey — the
  candidate equi-join reads corpus buckets in place and shuffles only
  the incoming batch (plan-pinned by
  tests/test_scale_dedup_ann.py::test_incremental_dedup_bucketed_corpus
  _never_reshuffles for the underlying join, and by the streaming test
  for this component).
- ``<name>_sets``: the corpus shingle-set arrays, BUCKETED BY doc_id —
  exact-Jaccard verification joins candidate rows against it without a
  corpus-wide shuffle.

Batch-internal near-dups are NOT collapsed here (both admit): the
standing-corpus check is the continuous decision; periodic intra-corpus
compaction is q108's near_dup_survivors, run as a maintenance pass.
doc_id is assumed globally unique across batches (the caller's ingest
contract, same as the reference's sourceMessageId uniqueness).

Reference semantics: dedup decision = q113 (best verified corpus match
at the Jaccard threshold); the streaming shape mirrors the ADT
pipeline's foreachBatch drain (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from emap_spark.plans.text_dedup import (
    JACCARD_THRESHOLD,
    lsh_band_keys,
    minhash_signatures,
)

_SHINGLE = (
    "array_distinct(transform(sequence(1, size(w)-2),"
    " i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"
)


class CorpusDedup:
    """foreachBatch-able continuous dedup against a durable corpus index.

    ``process_batch(docs)`` returns one decision row per incoming doc:
    (doc_id, dup_of, jaccard, admitted) — dup_of/jaccard null and
    admitted true for survivors, which are appended to the index."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        n_hashes: int = 8,
        n_bands: int = 2,
        n_buckets: int = 16,
        threshold: float = JACCARD_THRESHOLD,
    ) -> None:
        self.spark = spark
        self.bands_table = f"{name}_bands"
        self.sets_table = f"{name}_sets"
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.n_buckets = n_buckets
        self.threshold = threshold

    def _exists(self) -> bool:
        return self.spark.catalog.tableExists(self.sets_table)

    def process_batch(self, docs: DataFrame, batch_id: int = 0) -> DataFrame:
        """docs: (doc_id, text, ...). Returns the materialized decision
        frame; survivors' bands + shingle sets are appended to the index
        before it returns.

        At-least-once replay is handled HERE (foreachBatch may redeliver
        a batch after a crash between the index append and the caller's
        downstream commit): incoming doc_ids already present in the
        durable index were admitted by the prior attempt, so they are
        re-admitted idempotently (same decision row, dup_of null) and
        NOT re-scored — without this they would LSH-match their own
        prior index entries and bounce as rejected_dup of themselves —
        and their bands/sets are NOT appended again. Candidate scoring
        also excludes doc_id == dup_of outright as defense in depth.

        Crash WINDOW between the two index writes (bands written, sets
        not): the replay guard keys on sets_table — the LAST-written
        table — so the affected docs replay down the full re-score path,
        which yields the identical decisions (their own half-written
        band rows can never self-match: verification joins corpus sets
        on dup_of, and those docs have no sets row yet). The replay then
        appends their sets exactly once and their bands a second time —
        duplicate band rows are benign (the candidate join is
        ``.distinct()``). This is why bands are written FIRST: a
        sets-first order would leave replayed docs permanently bandless
        (re-admitted via the guard, never re-indexed), silently
        admitting their future near-dups."""
        sets = (
            docs.withColumn("w", F.split("text", " "))
            .select("doc_id", F.expr(_SHINGLE).alias("sh"))
        )

        sets_exists = self._exists()
        bands_exists = self.spark.catalog.tableExists(self.bands_table)

        replayed = None
        if sets_exists:
            # indexed ∩ incoming: scan only the bucketed sets table's
            # doc_id column against the broadcast batch ids — no shuffle
            replayed = self.spark.table(self.sets_table).select("doc_id").join(
                F.broadcast(sets.select("doc_id")), "doc_id", "semi"
            )
            sets = sets.join(F.broadcast(replayed), "doc_id", "left_anti")

        # PIN the batch frame NOW (batch-sized): the replay-guard
        # anti-join above reads sets_table, and the index writers below
        # APPEND to that table — an unmaterialized `sets` would be
        # re-evaluated by the bands writer AFTER the sets append, see
        # its own rows in the table, and anti-join them away (bands
        # written empty for every batch past the first). The checkpoint
        # also collapses the 4x re-evaluation of the shingle transform
        # (bands, candidate scoring, decisions, sets writer).
        sets = sets.localCheckpoint(eager=True)

        shingles = sets.select("doc_id", F.explode("sh").alias("s"))
        bands = lsh_band_keys(
            minhash_signatures(shingles, self.n_hashes),
            self.n_hashes,
            self.n_bands,
        )

        if bands_exists and sets_exists:
            corpus_bands = self.spark.table(self.bands_table).withColumnRenamed(
                "doc_id", "dup_of"
            )
            cand = (
                bands.join(corpus_bands, "bkey")
                .filter(F.col("doc_id") != F.col("dup_of"))
                .select("doc_id", "dup_of")
                .distinct()
            )
            corpus_sets = self.spark.table(self.sets_table).select(
                F.col("doc_id").alias("dup_of"), F.col("sh").alias("sb")
            )
            n_common = F.size(F.array_intersect("sa", "sb"))
            scored = (
                cand.join(sets.select("doc_id", F.col("sh").alias("sa")), "doc_id")
                .join(corpus_sets, "dup_of")
                .withColumn("n_common", n_common.cast("long"))
                .withColumn(
                    "jaccard_raw",
                    F.col("n_common").cast("double")
                    / (F.size("sa") + F.size("sb") - F.col("n_common")),
                )
                .filter(F.col("jaccard_raw") >= self.threshold)
            )
            wbest = W.partitionBy("doc_id").orderBy(
                F.col("jaccard_raw").desc(), F.col("dup_of")
            )
            best = (
                scored.withColumn("__rk", F.row_number().over(wbest))
                .filter(F.col("__rk") == 1)
                .select("doc_id", "dup_of", F.round("jaccard_raw", 6).alias("jaccard"))
            )
            decisions = (
                sets.select("doc_id")
                .join(best, "doc_id", "left")
                .withColumn("admitted", F.col("dup_of").isNull())
            )
        else:
            decisions = sets.select(
                "doc_id",
                F.lit(None).cast("long").alias("dup_of"),
                F.lit(None).cast("double").alias("jaccard"),
                F.lit(True).alias("admitted"),
            )

        if replayed is not None:
            # idempotent re-admits: already indexed by the prior attempt
            decisions = decisions.unionByName(
                replayed.select(
                    "doc_id",
                    F.lit(None).cast("long").alias("dup_of"),
                    F.lit(None).cast("double").alias("jaccard"),
                    F.lit(True).alias("admitted"),
                )
            )

        # one materialization: decisions drive BOTH the caller's sink
        # and the index appends
        decisions = decisions.localCheckpoint(eager=True)
        admitted = decisions.filter("admitted").select("doc_id")

        writer_bands = (
            bands.join(F.broadcast(admitted), "doc_id")
            .write.bucketBy(self.n_buckets, "bkey")
            .sortBy("bkey")
            .mode("append")
            .format("parquet")
        )
        writer_sets = (
            sets.join(F.broadcast(admitted), "doc_id")
            .write.bucketBy(self.n_buckets, "doc_id")
            .sortBy("doc_id")
            .mode("append")
            .format("parquet")
        )
        # bands BEFORE sets: the replay guard keys on sets_table (the
        # LAST-written table), so a crash between the two writes replays
        # down the re-score path — decisions are identical (see the
        # process_batch docstring), sets rows land exactly once, and the
        # only residue is duplicate band rows, which the distinct
        # candidate join absorbs. Every table read above gates on its
        # OWN existence check, so a first-batch crash (bands present,
        # sets absent) re-admits everything instead of raising
        # TABLE_OR_VIEW_NOT_FOUND.
        writer_bands.saveAsTable(self.bands_table)
        writer_sets.saveAsTable(self.sets_table)
        return decisions

    def run_stream(self, stream_df: DataFrame, checkpoint_dir: str):
        """Attach to a streaming document source; each micro-batch is
        deduped against (and admitted into) the corpus index."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def drop(self) -> None:
        for t in (self.bands_table, self.sets_table):
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")
