"""End-to-end continuous corpus preparation: the full training-data
ingestion loop as one foreachBatch-able component, composing the
oracle-checked operators in production order —

  1. quality gate   — Gopher-style repetition filters (q122): rejected
                      boilerplate never reaches dedup or the corpus;
  2. PII redaction  — q121's chained regexp scrub: the corpus only ever
                      stores redacted text (dedup shingles are computed
                      AFTER redaction, the standard order);
  2b. decontamination — q116's verbatim 8-gram check against a
                      held-out benchmark set (optional: pass
                      benchmark_docs): the gram set is computed ONCE at
                      construction (redacted with the same scrub, so
                      both sides normalize identically), broadcast, and
                      each batch pays one linear gram pass;
  3. corpus dedup   — CorpusDedup (q113 shape): the batch is checked
                      against the durable LSH index; only the incoming
                      side shuffles;
  4. packing        — q123's per-shard concat-then-chunk assignment;
                      packs are keyed (batch_id, source, pack_id) since
                      a continuous pipeline assembles packs within each
                      ingest slice, exactly as file-sharded production
                      packing does;
  5. durable append — the packed, redacted survivors land in a parquet
                      corpus table.

Scale shape: steps 1-2 and the pack cumsum are corpus-linear per batch
(plan-pinned for the underlying operators in test_physical_plans); step
3's per-batch cost is independent of corpus size at the shuffle level
(the corpus index is bucketed — see streaming/dedup.py). Nothing here
depends on batch count: state lives in the bucketed index tables and
the append-only corpus table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.plans.text_dedup import (
    NGRAM_DECONTAM,
    _ngram_hashes,
    pack_assignments,
    pii_redact_expr,
    repetition_stats,
)
from emap_spark.streaming.dedup import CorpusDedup


class CorpusPrep:
    """foreachBatch-able corpus-preparation loop.

    ``process_batch(docs)`` (docs: doc_id, text, source, ...) returns
    one outcome row per incoming doc: (doc_id, outcome, dup_of,
    jaccard) with outcome in {'rejected_quality', 'rejected_dup',
    'admitted'}; admitted docs are appended — redacted and packed — to
    ``<name>_corpus`` before it returns."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        budget: int = 256,
        benchmark_docs: DataFrame | None = None,
        decontam_max_rate: float = 0.0,
        **dedup_kwargs,
    ) -> None:
        self.spark = spark
        self.budget = budget
        self.dedup = CorpusDedup(spark, name, **dedup_kwargs)
        self.corpus_table = f"{name}_corpus"
        self.decontam_max_rate = decontam_max_rate
        self._bench_grams = None
        if benchmark_docs is not None:
            # the benchmark gram set is FIXED for the loop's lifetime:
            # compute once, redacted with the same scrub the incoming
            # side gets (both sides must normalize identically), pin it
            bd = benchmark_docs.select(
                "doc_id",
                pii_redact_expr().alias("text"),
                F.lit("bench").alias("source"),
            )
            self._bench_grams = (
                _ngram_hashes(bd, NGRAM_DECONTAM)
                .select("g")
                .distinct()
                .localCheckpoint(eager=True)
            )

    def process_batch(self, docs: DataFrame, batch_id: int = 0) -> DataFrame:
        keep = repetition_stats(docs).filter(F.col("keep")).select("doc_id")
        clean = docs.join(keep, "doc_id").select(
            "doc_id",
            pii_redact_expr().alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        if self._bench_grams is not None:
            # q116's check, incremental: one linear gram pass over the
            # batch, hits against the broadcast benchmark set; docs
            # whose contaminated gram fraction exceeds the threshold
            # never reach dedup or the corpus. The flag is computed as a
            # COLUMN of the batch frame so it rides the single clean
            # materialization below — one action/batch, not two (the
            # gram branch re-derives the cheap quality-join + redaction
            # exprs inside the same job; its doc_id-grouped exchange is
            # reuse-eligible). The decontam 8-grams and dedup's 3-word
            # shingles have different widths, so the frames cannot be
            # shared further.
            g = _ngram_hashes(
                clean.select("doc_id", "text", F.lit("b").alias("source")),
                NGRAM_DECONTAM,
            )
            sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ng"))
            hits = (
                g.join(F.broadcast(self._bench_grams), "g")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("nh"))
            )
            contam_ids = (
                sizes.join(hits, "doc_id")
                .filter(F.col("nh") / F.col("ng") > self.decontam_max_rate)
                .select("doc_id", F.lit(True).alias("__contam"))
            )
            clean = clean.join(F.broadcast(contam_ids), "doc_id", "left")
            clean = clean.withColumn(
                "__contam", F.coalesce(F.col("__contam"), F.lit(False))
            )
        else:
            clean = clean.withColumn("__contam", F.lit(False))

        # clean fans out to dedup's bands/sets writers, the admitted
        # join, the contaminated-outcome filter, and the corpus append —
        # materialize once (mirroring the decisions materialization in
        # CorpusDedup) so the quality join, the four-regex redaction,
        # and the decontam gram pass don't run 3-4x per micro-batch
        clean = clean.localCheckpoint(eager=True)
        contaminated = (
            clean.filter("__contam").select("doc_id")
            if self._bench_grams is not None
            else None
        )
        clean = clean.filter(~F.col("__contam")).drop("__contam")

        decisions = self.dedup.process_batch(clean, batch_id)

        admitted = clean.join(
            decisions.filter("admitted").select("doc_id"), "doc_id"
        )
        packed = pack_assignments(admitted, self.budget).select(
            "*", F.lit(batch_id).cast("long").alias("batch_id")
        )
        # Idempotent corpus append: the corpus table is PARTITIONED BY
        # batch_id and each batch dynamically overwrites only its own
        # partition.  A redelivered batch (crash after this append,
        # before the streaming commit) therefore REPLACES its prior
        # partition instead of double-appending — the replay
        # re-admission in CorpusDedup re-admits the same docs, and the
        # rewrite lands byte-equivalent.  O(batch), not O(corpus).
        if not self.spark.catalog.tableExists(self.corpus_table):
            packed.write.partitionBy("batch_id").format("parquet").saveAsTable(
                self.corpus_table
            )
        else:
            # statement-scoped partition overwrite: a FULLY-STATIC
            # PARTITION spec makes INSERT OVERWRITE touch only this
            # batch's partition regardless of the session's
            # partitionOverwriteMode — no session-conf set/restore, so
            # concurrent writers on the same SparkSession can never
            # inherit (or race the restore of) a mode they didn't set.
            # Column binding is BY NAME against the table's own order,
            # so a caller-side reordering can never transpose fields.
            tcols = [
                c
                for c in self.spark.table(self.corpus_table).columns
                if c != "batch_id"
            ]
            view = f"__corpus_prep_batch_{abs(hash(self.corpus_table)) % 10**8}"
            packed.select(*tcols).createOrReplaceTempView(view)
            try:
                self.spark.sql(
                    f"INSERT OVERWRITE TABLE {self.corpus_table} "
                    f"PARTITION (batch_id = {int(batch_id)}) "
                    f"SELECT * FROM {view}"
                )
            finally:
                self.spark.catalog.dropTempView(view)

        outcome = (
            F.when(F.col("__contam"), F.lit("rejected_contaminated"))
            .when(F.col("admitted").isNull(), F.lit("rejected_quality"))
            .when(~F.col("admitted"), F.lit("rejected_dup"))
            .otherwise(F.lit("admitted"))
        )
        base = docs.select("doc_id").join(
            decisions.select("doc_id", "dup_of", "jaccard", "admitted"),
            "doc_id",
            "left",
        )
        if contaminated is not None:
            base = base.join(
                F.broadcast(contaminated.withColumn("__contam", F.lit(True))),
                "doc_id",
                "left",
            ).withColumn("__contam", F.coalesce(F.col("__contam"), F.lit(False)))
        else:
            base = base.withColumn("__contam", F.lit(False))
        return base.select("doc_id", outcome.alias("outcome"), "dup_of", "jaccard")

    def run_stream(self, stream_df: DataFrame, checkpoint_dir: str):
        """Attach to a streaming document source; each micro-batch runs
        the full prepare-and-admit loop."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )

    def drop(self) -> None:
        self.dedup.drop()
        self.spark.sql(f"DROP TABLE IF EXISTS {self.corpus_table}")
