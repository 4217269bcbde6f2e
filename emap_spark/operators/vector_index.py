"""Durable IVF-PQ vector index: the embeddings counterpart of
streaming/dedup.CorpusDedup — build once, append batches forever, query
with real partition pruning.

q115 demonstrates the IVF-PQ *plan*; this makes its scale claims
physical state:

- the codes table is WRITTEN PARTITIONED BY cluster, so a query's
  n-probe cell selection becomes static partition pruning at the scan
  (PartitionFilters in the physical plan — pinned by
  tests/test_scale_dedup_ann.py) instead of a filter over the full
  corpus;
- centroids and the residual codebook persist as tiny side tables,
  broadcast on every encode/query — new batches encode against the
  FROZEN quantizers (the production contract: retraining is an offline
  rebuild, not an ingest-path mutation), so codes stay comparable
  across batches;
- the corpus is stored as M_SUB one-byte codes per vector (64x smaller
  than the float corpus) and queries never touch corpus floats — the
  ADC lookup-table fold from q115.

The probe-cell collect is a bounded scalar read (n_queries x n_probes
small ints), the same pattern as the engine's bucket-id reads
(storage/delta.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from emap_spark.plans.similarity import (
    K_CODES,
    M_SUB,
    SUB_DIM,
    _RESID,
    _d2,
    _subspace_rows,
    ivf_assignments,
    ivf_residuals,
    pq_encode_residuals,
)


class VectorIndex:
    """build(emb) -> add_batch(emb)* -> query(emb, ...) over parquet
    state at ``root`` (centroids/, codebook/, codes/ partitioned by
    cluster). Vector ids are assumed globally unique across batches."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        kc: int = 8,
        k: int = K_CODES,
    ) -> None:
        self.spark = spark
        self.root = root
        self.kc = kc
        self.k = k
        self._cents_path = os.path.join(root, "centroids")
        self._cb_path = os.path.join(root, "codebook")
        self._codes_path = os.path.join(root, "codes")

    # -- state ---------------------------------------------------------
    def _cents(self) -> DataFrame:
        return self.spark.read.parquet(self._cents_path)

    def _codebook(self) -> DataFrame:
        return self.spark.read.parquet(self._cb_path)

    def exists(self) -> bool:
        return os.path.isdir(self._cents_path)

    # -- write paths ----------------------------------------------------
    def build(self, emb: DataFrame) -> None:
        """Train the quantizers on the seed corpus (deterministic seed
        centroids/codebook — production swaps in offline k-means, same
        shapes) and encode it. Overwrites any existing index."""
        cents = emb.filter(F.col("vec_id") < self.kc).select(
            F.col("vec_id").alias("cluster"), F.col("embedding").alias("ce")
        )
        cents.write.mode("overwrite").parquet(self._cents_path)
        cents = self._cents()  # re-read: the stored quantizer is the truth
        resid = ivf_residuals(ivf_assignments(emb, cents), cents)
        cb = _subspace_rows(
            resid.filter(F.col("vec_id") < self.k), "vec_id", "re", "cv"
        ).select(F.col("vec_id").alias("code"), "j", "cv")
        cb.write.mode("overwrite").parquet(self._cb_path)
        self._append_codes(resid, mode="overwrite")

    def add_batch(self, emb: DataFrame) -> None:
        """Encode a new batch against the FROZEN quantizers and append
        its codes to the partitioned corpus."""
        cents = self._cents()
        resid = ivf_residuals(ivf_assignments(emb, cents), cents)
        self._append_codes(resid, mode="append")

    def _append_codes(self, resid: DataFrame, mode: str) -> None:
        codes = pq_encode_residuals(resid, self._codebook())
        codes.write.mode(mode).partitionBy("cluster").parquet(self._codes_path)

    # -- read path -------------------------------------------------------
    def query(
        self, q_emb: DataFrame, n_probes: int = 2, top_k: int = 10
    ) -> DataFrame:
        """(query_id, qe) -> ADC top-k over ONLY the probed cells. The
        probe list collects to the driver (bounded: queries x probes
        ints) and becomes literal partition filters on the codes scan."""
        cents = self._cents()
        wq = W.partitionBy("query_id").orderBy(_d2("qe", "ce"), F.col("cluster"))
        probes = (
            q_emb.crossJoin(F.broadcast(cents))
            .withColumn("__pr", F.row_number().over(wq))
            .filter(F.col("__pr") <= n_probes)
            .select(
                "query_id",
                "cluster",
                F.expr(_RESID.format(a="qe", b="ce")).alias("qr"),
            )
        )
        qslices = F.array(
            *[F.slice(F.col("qr"), j * SUB_DIM + 1, SUB_DIM) for j in range(M_SUB)]
        )
        qsub = probes.select(
            "query_id", "cluster", F.posexplode(qslices).alias("j", "qv")
        )
        cb = self._codebook()
        qtab = (
            qsub.join(F.broadcast(cb), "j")
            .withColumn("d", _d2("qv", "cv"))
            .groupBy("query_id", "cluster")
            .agg(F.array_sort(F.collect_list(F.struct("j", "code", "d"))).alias("a"))
            .select(
                "query_id", "cluster", F.expr("transform(a, x -> x.d)").alias("darr")
            )
        )
        probed = sorted(
            r.cluster for r in probes.select("cluster").distinct().collect()
        )
        codes = self.spark.read.parquet(self._codes_path).filter(
            F.col("cluster").isin(probed)  # literal -> static partition pruning
        )
        adc = F.expr(
            f"round(aggregate(sequence(0, {M_SUB - 1}), cast(0.0 as double),"
            f" (acc, j) -> acc + element_at(darr,"
            f" cast(j * {self.k} + element_at(codes, j + 1) + 1 as int))), 6)"
        )
        scored = (
            codes.join(F.broadcast(qtab), "cluster")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                "cluster",
                adc.alias("adc_d2"),
            )
        )
        wtop = W.partitionBy("query_id").orderBy(
            F.col("adc_d2"), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(wtop))
            .filter(F.col("rk") <= top_k)
            .select("query_id", "neighbor_id", "cluster", "adc_d2")
        )
