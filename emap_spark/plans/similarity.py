"""Similarity search over the `embeddings` table (array<float> vectors,
BASELINE.json north_star): brute-force cosine top-k as the exact
baseline, sign-LSH bucketed ANN as the scale path, vector stats, and
label centroids.

Numeric determinism: dot products fold the arrays sequentially in
DOUBLE on both engines (Spark `aggregate`, DuckDB `list_dot_product`
over DOUBLE[]), and similarities are rounded to 4 decimals BEFORE
ranking, with vec_id tie-breaks — so top-k selection is cross-engine
stable. Centroids aggregate per-dimension through DECIMAL (exact).

Scale notes: brute-force is O(Q x N) with a broadcast query side — fine
for small Q; the ANN variant buckets candidates by an 8-bit sign LSH so
each query probes ~N/256 of the corpus; at 100 TB you'd raise the bit
count and store bucket as a partition column for pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from emap_spark.registry import register
from emap_spark.sources.tables import load_table

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10
LSH_BITS = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # parallelism follows COMPUTE, not bytes: the embedding table
    # compresses below one split, and the dot-product/LSH work per row
    # dwarfs its bytes — fan it out (see text_dedup._docs for the full
    # rationale; at 100 TB the file count provides the splits)
    return e.repartition(spark.sparkContext.defaultParallelism)


def _dot(a: str, b: str) -> Column:
    """Sequential double-precision fold of the elementwise product.

    Kept as the aggregate() fold after two r9 A/Bs of a static-64-dim
    UNROLLED sum (left-associated, 0.0-seeded — bit-identical values,
    verified): the pure unrolled chain was a wash on the kNN lane (3/5
    paired reps, mins 1.424 vs 1.515 s — the lane is join/window-bound,
    not fold-bound), and a dim-guarded CASE variant was actively harmful
    (0/5, up to 2x slower: the fold branch is CodegenFallback, and one
    such child forces the WHOLE CaseWhen — including the unrolled branch
    — into interpreted evaluation). The fold also stays correct for any
    dimensionality, which the unrolled form would silently truncate."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(_dot(a, a))


_SQL_D = "list_transform({0}, x -> x::DOUBLE)"
_SQL_COS = (
    f"list_dot_product({_SQL_D.format('{a}')}, {_SQL_D.format('{b}')})"
    f" / (sqrt(list_dot_product({_SQL_D.format('{a}')}, {_SQL_D.format('{a}')}))"
    f" * sqrt(list_dot_product({_SQL_D.format('{b}')}, {_SQL_D.format('{b}')})))"
)


def _sql_cos(a: str, b: str) -> str:
    return _SQL_COS.format(a=a, b=b)


# --------------------------------------------------------------------------
# q50: brute-force cosine top-k (exact kNN baseline)
# --------------------------------------------------------------------------
@register(
    "q50_knn_bruteforce",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_sql_cos('q.qe', 'e.embedding')}, 4) AS cosine_sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
""",
    doc=(
        "Exact kNN: broadcast the query vectors, score all candidates "
        "JVM-side with a sequential double fold, rank per query."
    ),
)
def q50_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cand = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    scored = (
        F.broadcast(q)
        .join(cand, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot("qe", "ce") / (_norm("qe") * _norm("ce")), 4).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim")
    )


# --------------------------------------------------------------------------
# q51: sign-LSH bucketed ANN (the scale path)
# --------------------------------------------------------------------------
_SQL_BUCKET = (
    "("
    + " + ".join(f"(CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)" for j in range(LSH_BITS))
    + ")::BIGINT"
)


def _sign_bucket(bits: int) -> Column:
    bucket = None
    for j in range(bits):
        term = F.when(F.element_at("embedding", j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


# production sizing: 16 sign bits (~65k buckets) + multi-probe for
# recall; the registered oracle query runs the toy 8-bit single-probe
PROD_ANN_BITS = 16
PROD_ANN_PROBES = 8


def sign_lsh_ann(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    bits: int = LSH_BITS,
    top_k: int = TOP_K,
    n_probes: int = 1,
) -> DataFrame:
    """Sign-LSH bucketed ANN, parameterized (bits, multi-probe).

    Each query probes its own hyperoctant bucket plus `n_probes - 1`
    Hamming-1 neighbors (one sign bit flipped) — the standard multi-probe
    recall fix for LSH without extra tables. Candidates come from an
    equi-join on bucket (hash join, ~N/2^bits per probe); at scale,
    bucket doubles as the corpus partition key so probes prune
    partitions.
    """
    b = emb.select("vec_id", "embedding", _sign_bucket(bits).alias("bucket"))
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << j))
            for j in range(min(n_probes - 1, bits))
        ],
    )
    q = (
        b.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            "bucket",
            F.explode(probes).alias("probe"),
        )
    )
    c = b.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"),
                 F.col("bucket").alias("cbucket"))
    scored = (
        F.broadcast(q)
        .join(c, (F.col("cbucket") == F.col("probe")) & (F.col("neighbor_id") != F.col("query_id")))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(_dot("qe", "ce") / (_norm("qe") * _norm("ce")), 4).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("query_id", "neighbor_id", "bucket", "cosine_sim")
    )


@register(
    "q51_ann_lsh_bucketed",
    oracle=f"""
WITH b AS (SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, q.bucket,
         round({_sql_cos('q.qe', 'c.embedding')}, 4) AS cosine_sim
  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, bucket, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 5
""",
    doc=(
        "ANN via sign-LSH: candidates restricted to the query's hyperoctant "
        "bucket (equi join on bucket -> hash join, ~N/2^bits candidates per "
        "query; bucket doubles as a partition key at scale; multi-probe "
        "via the n_probes parameter of sign_lsh_ann)."
    ),
)
def q51_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle-sized instance: 8 bits, single probe, top-5
    return sign_lsh_ann(_emb(spark, sf_dir), N_QUERIES, LSH_BITS, 5, n_probes=1)


# --------------------------------------------------------------------------
# q52: per-vector stats (array aggregation surface)
# --------------------------------------------------------------------------
@register(
    "q52_vector_stats",
    oracle=f"""
SELECT vec_id, label,
       round(sqrt(list_dot_product({_SQL_D.format('embedding')}, {_SQL_D.format('embedding')})), 4) AS l2_norm,
       round(list_sum({_SQL_D.format('embedding')}) / len(embedding), 6) AS vec_mean,
       len(embedding) AS dim
FROM embeddings
""",
    doc="Vector feature extraction: norm/mean/dim, all array built-ins.",
)
def q52_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    total = F.expr(
        "aggregate(embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double))"
    )
    return e.select(
        "vec_id",
        "label",
        F.round(_norm("embedding"), 4).alias("l2_norm"),
        F.round(total / F.size("embedding"), 6).alias("vec_mean"),
        F.size("embedding").cast("long").alias("dim"),
    )


# --------------------------------------------------------------------------
# q53: label centroids (posexplode + decimal-exact per-dim mean)
# --------------------------------------------------------------------------
@register(
    "q53_label_centroids",
    oracle="""
SELECT label, i AS dim,
       round(sum(embedding[i]::DECIMAL(20,10))::DOUBLE / count(*), 6) AS centroid,
       count(*) AS n_vectors
FROM embeddings, range(1, 65) t(i)
GROUP BY label, i
""",
    doc=(
        "Per-label centroid: positional explode + decimal-exact mean per "
        "dimension (order-insensitive across partitions)."
    ),
)
def q53_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        ex.groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


# --------------------------------------------------------------------------
# q58: IVF ANN — coarse-quantizer partition probe (the other scale path)
# --------------------------------------------------------------------------
def _d2(a: str, b: str):
    """Squared L2 as the same sequential double fold on both engines."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        " (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def ivf_refine(emb: DataFrame, centroids: DataFrame, iters: int) -> DataFrame:
    """Optional Lloyd steps: assign to nearest centroid, recompute
    per-dim decimal-exact means (the q53 pattern — order-insensitive
    across partitions). Production would run k-means++ offline and
    store cluster as a partition column."""
    for _ in range(iters):
        assign = ivf_assignments(emb, centroids)
        ex = assign.select("cluster", F.posexplode("embedding").alias("pos", "v"))
        dims = ex.groupBy("cluster", "pos").agg(
            (F.sum(F.col("v").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1))).alias("cv")
        )
        centroids = (
            dims.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("a"))
            .select("cluster", F.expr("transform(a, x -> x.cv)").alias("ce"))
        )
    return centroids


def ivf_assignments(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Every vector -> its nearest coarse centroid (argmin squared L2,
    centroid id tie-break). The centroid set is broadcast; at scale the
    cluster id becomes the corpus partition key so probes prune
    partitions instead of scanning."""
    j = emb.crossJoin(F.broadcast(centroids))
    w = W.partitionBy("vec_id").orderBy(_d2("embedding", "ce"), F.col("cluster"))
    return (
        j.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("vec_id", "embedding", "cluster")
    )


def ivf_ann(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = 8,
    n_probes: int = 2,
    top_k: int = TOP_K,
    iters: int = 0,
) -> DataFrame:
    """IVF: partition the corpus by a k-centroid coarse quantizer; each
    query scans only its n_probes nearest clusters (~n_probes/k of the
    corpus). Complements sign-LSH: data-adaptive cells instead of fixed
    hyperoctants."""
    seeds = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("ce")
    )
    centroids = ivf_refine(emb, seeds, iters)
    assign = ivf_assignments(emb, centroids)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    wq = W.partitionBy("query_id").orderBy(_d2("qe", "ce"), F.col("cluster"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= n_probes)
        .select("query_id", "qe", "cluster")
    )
    c = assign.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"), "cluster"
    )
    scored = (
        F.broadcast(probes)
        .join(c, "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cluster",
            F.round(_dot("qe", "ne") / (_norm("qe") * _norm("ne")), 4).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("query_id", "neighbor_id", "cluster", "cosine_sim")
    )


_SQL_D2 = (
    "list_sum(list_transform(range(1, 65), j ->"
    " ({a}[j]::DOUBLE - {b}[j]::DOUBLE) * ({a}[j]::DOUBLE - {b}[j]::DOUBLE)))"
)


@register(
    "q58_ann_ivf_probe",
    oracle=f"""
WITH c AS (SELECT vec_id AS cluster, embedding AS ce FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_SQL_D2.format(a='e.embedding', b='c.ce')}, c.cluster) AS rk
    FROM embeddings e, c
  ) WHERE rk = 1
),
probes AS (
  SELECT query_id, qe, cluster FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qe, c.cluster,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_SQL_D2.format(a='q.embedding', b='c.ce')}, c.cluster) AS pr
    FROM embeddings q, c WHERE q.vec_id < {N_QUERIES}
  ) WHERE pr <= 2
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, p.cluster,
         round({_sql_cos('p.qe', 'a.embedding')}, 4) AS cosine_sim
  FROM probes p JOIN assign a USING (cluster)
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cluster, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
""",
    doc=(
        "IVF ANN: k=8 coarse-quantizer cells (seeded; Lloyd refinement "
        "available via ivf_refine), 2-cell probe per query — the "
        "data-adaptive partition-pruning scale path alongside sign-LSH. "
        "Squared-L2 argmin is the same sequential double fold on both "
        "engines."
    ),
)
def q58_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_ann(_emb(spark, sf_dir), N_QUERIES, 8, 2, TOP_K, iters=0)


# --------------------------------------------------------------------------
# q59: embedding-cosine near-duplicate PAIRS (the dedup variant — the
# LSH/IVF queries above are search; this is corpus-vs-corpus)
# --------------------------------------------------------------------------
NEARDUP_THRESHOLD = 0.99


def cosine_near_dup_pairs(
    emb: DataFrame, bits: int = LSH_BITS, threshold: float = NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: candidate pairs come
    from a sign-LSH bucket EQUI-join (hash join, ~N/2^bits rows per
    bucket; bucket doubles as the partition key at 100 TB), then exact
    cosine verifies candidates only — no all-pairs shuffle anywhere.
    Same candidates-then-verify shape as the MinHash text pipeline (q57).
    """
    b = emb.select("vec_id", "embedding", _sign_bucket(bits).alias("bucket"))
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("src_id"),
            F.col("c.vec_id").alias("dup_id"),
            F.round(
                _dot("a.embedding", "c.embedding")
                / (_norm("a.embedding") * _norm("c.embedding")),
                4,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


@register(
    "q59_cosine_near_dup_pairs",
    oracle=f"""
WITH seeded AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding, x -> (x * 1.05)::FLOAT)
  FROM embeddings WHERE vec_id < 5
),
b AS (SELECT vec_id, embedding,
  ({_SQL_BUCKET}) AS bucket FROM seeded)
SELECT a.vec_id AS src_id, c.vec_id AS dup_id,
       round({_sql_cos('a.embedding', 'c.embedding')}, 4) AS cosine_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round({_sql_cos('a.embedding', 'c.embedding')}, 4) >= {NEARDUP_THRESHOLD}
""",
    doc=(
        "Embedding-cosine near-dup dedup: sign-LSH bucket candidates + "
        "exact cosine verify (candidates only). The corpus has no true "
        "near-dups, so 5 sign-preserving scaled copies are seeded "
        "(identically in Spark and oracle) — the positive path is "
        "gate-proven, the negatives (all real in-bucket pairs, cosine "
        "<= 0.4) prove the filter."
    ),
)
def q59_cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    seeds = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> cast(x * cast(1.05 as double) as float))"
        ).alias("embedding"),
    )
    return cosine_near_dup_pairs(emb.unionByName(seeds))


# --------------------------------------------------------------------------
# q114: product-quantization ANN (ADC scan — the memory-scale path)
# --------------------------------------------------------------------------
# IVF (q58) prunes WHICH vectors a query scans; PQ compresses HOW MUCH
# memory each scanned vector costs: the 64-float embedding becomes
# M_SUB one-byte codes (64x compression), and query-time distance is a
# table lookup — the asymmetric-distance (ADC) scan every
# billion-vector ANN deployment runs (IVF-PQ). Codebooks are seeded
# from the first K_CODES vectors per subspace (deterministic; real
# deployments train them offline with k-means and ship them broadcast,
# exactly as here).
M_SUB = 8      # subspaces (64 dims -> 8 per subspace)
SUB_DIM = 8
K_CODES = 16   # codes per subspace codebook (1 byte would allow 256)


def _subspace_rows(df: DataFrame, id_col: str, vec_col: str, out: str) -> DataFrame:
    """(id, embedding) -> (id, j, <out>=8-dim slice) one row per subspace."""
    slices = F.array(
        *[F.slice(F.col(vec_col), j * SUB_DIM + 1, SUB_DIM) for j in range(M_SUB)]
    )
    return df.select(id_col, F.posexplode(slices).alias("j", out))


def pq_seed_codebook(emb: DataFrame, k: int = K_CODES) -> DataFrame:
    """Deterministic seed codebook: the first k vectors' sub-slices,
    one (code, j, cv) row per subspace."""
    return _subspace_rows(
        emb.filter(F.col("vec_id") < k), "vec_id", "embedding", "cv"
    ).select(F.col("vec_id").alias("code"), "j", "cv")


def pq_assignments(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """Each (vec_id, j) sub-vector -> its nearest codebook entry
    (argmin squared-L2, code-id tie-break); the codebook is broadcast."""
    w = W.partitionBy("vec_id", "j").orderBy(_d2("sv", "cv"), F.col("code"))
    return (
        sub.join(F.broadcast(codebook), "j")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
    )


def pq_refine(emb: DataFrame, codebook: DataFrame, iters: int = 1) -> DataFrame:
    """Lloyd steps per subspace (the q58 ivf_refine pattern applied to
    PQ): assign sub-vectors, recompute per-dimension decimal-exact
    means. Monotonically non-increasing quantization error; cells that
    lose all members drop out (their codes simply stop being assigned).
    Production trains offline exactly like this and ships the codebook
    broadcast."""
    sub = _subspace_rows(emb, "vec_id", "embedding", "sv")
    for _ in range(iters):
        a = pq_assignments(sub, codebook).select(
            "j", "code", F.posexplode("sv").alias("pos", "v")
        )
        dims = a.groupBy("j", "code", "pos").agg(
            (
                F.sum(F.col("v").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv1")
        )
        codebook = (
            dims.groupBy("j", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv1"))).alias("a"))
            .select("code", "j", F.expr("transform(a, x -> x.cv1)").alias("cv"))
        )
    return codebook


def pq_codes(
    emb: DataFrame, k: int = K_CODES, codebook: DataFrame | None = None
) -> DataFrame:
    """Encode every vector as M_SUB nearest-centroid codes (argmin
    squared-L2 per subspace, code-id tie-break). The codebook side is
    tiny and broadcast; the corpus side never shuffles its floats —
    at scale the output (vec_id, codes) replaces the float corpus in
    memory at 64x compression."""
    cb = codebook if codebook is not None else pq_seed_codebook(emb, k)
    best = pq_assignments(_subspace_rows(emb, "vec_id", "embedding", "sv"), cb)
    return (
        best.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "code"))).alias("a"))
        .select("vec_id", F.expr("transform(a, x -> x.code)").alias("codes"))
    )


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = K_CODES,
    top_k: int = TOP_K,
) -> DataFrame:
    """ADC top-k: each query precomputes its M_SUB x k distance table
    (one tiny broadcast row per query), and the corpus scan is a
    sequential fold of table lookups over each vector's codes — no
    floats from the corpus are touched at query time. Distances fold
    in a FIXED subspace order on both engines, so results are
    cross-engine exact."""
    codes = pq_codes(emb, k)
    seeds = _subspace_rows(
        emb.filter(F.col("vec_id") < k), "vec_id", "embedding", "cv"
    ).select(F.col("vec_id").alias("code"), "j", "cv")
    qsub = _subspace_rows(
        emb.filter(F.col("vec_id") < n_queries), "vec_id", "embedding", "qv"
    ).select(F.col("vec_id").alias("query_id"), "j", "qv")
    # per-query ADC lookup table, ordered (j, code) -> index j*k + code
    qtab = (
        qsub.join(F.broadcast(seeds), "j")
        .withColumn("d", _d2("qv", "cv"))
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "code", "d"))).alias("a"))
        .select("query_id", F.expr("transform(a, x -> x.d)").alias("darr"))
    )
    adc = F.expr(
        f"round(aggregate(sequence(0, {M_SUB - 1}), cast(0.0 as double),"
        f" (acc, j) -> acc + element_at(darr,"
        f" cast(j * {k} + element_at(codes, j + 1) + 1 as int))), 6)"
    )
    scored = (
        codes.join(F.broadcast(qtab))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), adc.alias("adc_d2"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc_d2"), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("query_id", "neighbor_id", "adc_d2")
    )


_SQL_SUB_D2 = (
    "list_sum(list_transform(range(1, {n}), i ->"
    " ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))"
)


@register(
    "q114_pq_adc_topk",
    oracle=f"""
WITH js AS (SELECT unnest(range(0, {M_SUB})) AS j),
sub AS (
  SELECT vec_id, j, embedding[j*{SUB_DIM}+1 : j*{SUB_DIM}+{SUB_DIM}] AS sv
  FROM embeddings, js
),
seeds AS (
  SELECT vec_id AS code, j, sv AS cv FROM sub WHERE vec_id < {K_CODES}
),
codes AS (
  SELECT vec_id, list(code ORDER BY j) AS codes FROM (
    SELECT s.vec_id, s.j, d.code,
           row_number() OVER (PARTITION BY s.vec_id, s.j
             ORDER BY {_SQL_SUB_D2.format(n=SUB_DIM + 1, a='s.sv', b='d.cv')}, d.code) AS rk
    FROM sub s JOIN seeds d USING (j)
  ) WHERE rk = 1 GROUP BY vec_id
),
qtab AS (
  SELECT query_id, list(d ORDER BY j, code) AS darr FROM (
    SELECT q.vec_id AS query_id, q.j, d.code,
           {_SQL_SUB_D2.format(n=SUB_DIM + 1, a='q.sv', b='d.cv')} AS d
    FROM sub q JOIN seeds d USING (j) WHERE q.vec_id < {N_QUERIES}
  ) GROUP BY query_id
),
scored AS (
  SELECT t.query_id, c.vec_id AS neighbor_id,
         round(list_sum(list_transform(range(0, {M_SUB}),
               j -> darr[j*{K_CODES} + codes[j+1] + 1])), 6) AS adc_d2
  FROM codes c, qtab t WHERE c.vec_id <> t.query_id
)
SELECT query_id, neighbor_id, adc_d2
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_d2, neighbor_id) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
""",
    doc=(
        "Product-quantization ANN: vectors encode to 8 one-byte "
        "subspace codes (64x memory compression) and queries scan via "
        "the ADC lookup-table fold — the billion-vector IVF-PQ recipe. "
        "Codebooks are deterministic seed slices; distances fold in "
        "fixed subspace order, so both engines agree bit-for-bit."
    ),
)
def q114_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_adc_topk(_emb(spark, sf_dir), N_QUERIES, K_CODES, TOP_K)


# --------------------------------------------------------------------------
# q115: IVF-PQ — the composed billion-vector recipe (residual encoding)
# --------------------------------------------------------------------------
# q58 prunes WHICH cells a query scans; q114 compresses each scanned
# vector to byte codes. Composed — and with PQ encoding the RESIDUAL
# (vector minus its cell centroid), as every production IVF-PQ index
# does, because residuals concentrate near zero so a shared codebook
# quantizes them far better than raw vectors — this is the complete
# recipe behind billion-scale ANN deployments: probe n_probes cells,
# ADC-scan only their codes, never touching corpus floats at query
# time. At 100 TB: cluster id = partition column (probe = partition
# pruning), codes table = 64x smaller than the float corpus, codebook
# + per-query ADC tables broadcast.
_RESID = "zip_with({a}, {b}, (x, y) -> cast(x as double) - cast(y as double))"


def ivf_residuals(assign: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding, cluster) + broadcast centroids ->
    (vec_id, cluster, re) residual vectors."""
    return assign.join(F.broadcast(cents), "cluster").select(
        "vec_id",
        "cluster",
        F.expr(_RESID.format(a="embedding", b="ce")).alias("re"),
    )


def pq_encode_residuals(resid: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, cluster, re) -> (vec_id, cluster, codes): argmin
    squared-L2 per subspace against the broadcast codebook (code-id
    tie-break) — the corpus never shuffles its floats."""
    slices = F.array(
        *[F.slice(F.col("re"), j * SUB_DIM + 1, SUB_DIM) for j in range(M_SUB)]
    )
    sub = resid.select("vec_id", "cluster", F.posexplode(slices).alias("j", "sv"))
    wbest = W.partitionBy("vec_id", "j").orderBy(_d2("sv", "cv"), F.col("code"))
    return (
        sub.join(F.broadcast(codebook), "j")
        .withColumn("__rk", F.row_number().over(wbest))
        .filter(F.col("__rk") == 1)
        .groupBy("vec_id", "cluster")
        .agg(F.array_sort(F.collect_list(F.struct("j", "code"))).alias("a"))
        .select("vec_id", "cluster", F.expr("transform(a, x -> x.code)").alias("codes"))
    )


def ivf_pq_topk(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    kc: int = 8,
    n_probes: int = 2,
    k: int = K_CODES,
    top_k: int = TOP_K,
) -> DataFrame:
    """IVF-PQ ADC top-k: coarse-assign every vector (broadcast argmin,
    as q58), PQ-encode its RESIDUAL against the cell centroid (broadcast
    codebook argmin per subspace, as q114), probe each query's n_probes
    nearest cells, and score candidates with a per-(query, cell) ADC
    lookup table over the query's residual. One shuffle on the corpus
    side (the per-vector code fold); everything query-side is broadcast.
    Distances fold in fixed subspace order — cross-engine exact."""
    cents = emb.filter(F.col("vec_id") < kc).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("ce")
    )
    assign = ivf_assignments(emb, cents)
    resid = ivf_residuals(assign, cents)
    # residual codebook: the first k vectors' residual slices (seeded,
    # deterministic — production trains offline with k-means, same shape)
    seeds = _subspace_rows(
        resid.filter(F.col("vec_id") < k), "vec_id", "re", "cv"
    ).select(F.col("vec_id").alias("code"), "j", "cv")
    codes = pq_encode_residuals(resid, seeds)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    wq = W.partitionBy("query_id").orderBy(_d2("qe", "ce"), F.col("cluster"))
    probes = (
        q.crossJoin(F.broadcast(cents))
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
    qsub = probes.select("query_id", "cluster", F.posexplode(qslices).alias("j", "qv"))
    qtab = (
        qsub.join(F.broadcast(seeds), "j")
        .withColumn("d", _d2("qv", "cv"))
        .groupBy("query_id", "cluster")
        .agg(F.array_sort(F.collect_list(F.struct("j", "code", "d"))).alias("a"))
        .select("query_id", "cluster", F.expr("transform(a, x -> x.d)").alias("darr"))
    )
    adc = F.expr(
        f"round(aggregate(sequence(0, {M_SUB - 1}), cast(0.0 as double),"
        f" (acc, j) -> acc + element_at(darr,"
        f" cast(j * {k} + element_at(codes, j + 1) + 1 as int))), 6)"
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
    wtop = W.partitionBy("query_id").orderBy(F.col("adc_d2"), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= top_k)
        .select("query_id", "neighbor_id", "cluster", "adc_d2")
    )


_SQL_RESID = (
    "list_transform(range(1, 65), i -> {a}[i]::DOUBLE - {b}[i]::DOUBLE)"
)


@register(
    "q115_ivf_pq_topk",
    oracle=f"""
WITH c AS (SELECT vec_id AS cluster, embedding AS ce FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, embedding, cluster, ce FROM (
    SELECT e.vec_id, e.embedding, c.cluster, c.ce,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_SQL_D2.format(a='e.embedding', b='c.ce')}, c.cluster) AS rk
    FROM embeddings e, c
  ) WHERE rk = 1
),
resid AS (
  SELECT vec_id, cluster, {_SQL_RESID.format(a='embedding', b='ce')} AS re
  FROM assign
),
js AS (SELECT unnest(range(0, {M_SUB})) AS j),
rsub AS (
  SELECT vec_id, cluster, j, re[j*{SUB_DIM}+1 : j*{SUB_DIM}+{SUB_DIM}] AS sv
  FROM resid, js
),
seeds AS (SELECT vec_id AS code, j, sv AS cv FROM rsub WHERE vec_id < {K_CODES}),
codes AS (
  SELECT vec_id, cluster, list(code ORDER BY j) AS codes FROM (
    SELECT s.vec_id, s.cluster, s.j, d.code,
           row_number() OVER (PARTITION BY s.vec_id, s.j
             ORDER BY {_SQL_SUB_D2.format(n=SUB_DIM + 1, a='s.sv', b='d.cv')}, d.code) AS rk
    FROM rsub s JOIN seeds d USING (j)
  ) WHERE rk = 1 GROUP BY vec_id, cluster
),
probes AS (
  SELECT query_id, cluster, {_SQL_RESID.format(a='qe', b='ce')} AS qr FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qe, c.cluster, c.ce,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_SQL_D2.format(a='q.embedding', b='c.ce')}, c.cluster) AS pr
    FROM embeddings q, c WHERE q.vec_id < {N_QUERIES}
  ) WHERE pr <= 2
),
qsub AS (
  SELECT query_id, cluster, j, qr[j*{SUB_DIM}+1 : j*{SUB_DIM}+{SUB_DIM}] AS qv
  FROM probes, js
),
qtab AS (
  SELECT query_id, cluster, list(d ORDER BY j, code) AS darr FROM (
    SELECT q.query_id, q.cluster, q.j, d.code,
           {_SQL_SUB_D2.format(n=SUB_DIM + 1, a='q.qv', b='d.cv')} AS d
    FROM qsub q JOIN seeds d USING (j)
  ) GROUP BY query_id, cluster
),
scored AS (
  SELECT t.query_id, c2.vec_id AS neighbor_id, c2.cluster,
         round(list_sum(list_transform(range(0, {M_SUB}),
               j -> darr[j*{K_CODES} + codes[j+1] + 1])), 6) AS adc_d2
  FROM codes c2 JOIN qtab t USING (cluster)
  WHERE c2.vec_id <> t.query_id
)
SELECT query_id, neighbor_id, cluster, adc_d2
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY adc_d2, neighbor_id) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
""",
    doc=(
        "IVF-PQ: coarse cells prune WHICH vectors a query scans "
        "(2-probe partition pruning), PQ codes over cell RESIDUALS "
        "compress WHAT it scans (64x; residuals concentrate near zero "
        "so the shared codebook quantizes them better than raw "
        "vectors), and the ADC lookup-table fold scores candidates "
        "without touching corpus floats — the composed billion-vector "
        "recipe. Seeded codebooks; fixed fold order — cross-engine "
        "exact."
    ),
)
def q115_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_pq_topk(_emb(spark, sf_dir), N_QUERIES, 8, 2, K_CODES, TOP_K)


# --------------------------------------------------------------------------
# q120: embedding near-dup CLUSTERS + survivors (completes the symmetry:
# text has pairs -> clusters -> survivors; q59 stopped at pairs)
# --------------------------------------------------------------------------
@register(
    "q120_cosine_near_dup_clusters",
    oracle=f"""
WITH RECURSIVE seeded AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding, x -> (x * 1.05)::FLOAT)
  FROM embeddings WHERE vec_id < 5
),
b AS (SELECT vec_id, embedding,
  ({_SQL_BUCKET}) AS bucket FROM seeded),
dup AS (
  SELECT a.vec_id AS src_id, c.vec_id AS dup_id
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE round({_sql_cos('a.embedding', 'c.embedding')}, 4) >= {NEARDUP_THRESHOLD}
),
edges AS (
  SELECT src_id AS a, dup_id AS b FROM dup
  UNION SELECT dup_id, src_id FROM dup
),
reach(a, b) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
),
cc AS (SELECT a AS vec_id, min(b) AS cluster_id FROM reach GROUP BY a)
SELECT cluster_id,
       count(*)::BIGINT AS n_vecs,
       cluster_id AS survivor_vec_id,
       (count(*) - 1)::BIGINT AS n_removed
FROM cc
GROUP BY cluster_id
HAVING count(*) > 1
""",
    doc=(
        "Embedding near-dup CLUSTERING: q59's verified cosine pairs "
        "collapse to connected components (min-label propagation, "
        "bounded rounds) with one survivor per cluster — the embedding-"
        "side counterpart of q108, the operation that actually shrinks "
        "a vector corpus. Same seeded positives as q59."
    ),
)
def q120_cosine_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.plans.text_dedup import connected_components

    pairs = q59_cosine_near_dup_pairs(spark, sf_dir).select(
        F.col("src_id").alias("doc_a"), F.col("dup_id").alias("doc_b")
    )
    cc = connected_components(pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .filter(F.col("n_vecs") > 1)
        .select(
            "cluster_id",
            "n_vecs",
            F.col("cluster_id").alias("survivor_vec_id"),
            (F.col("n_vecs") - 1).cast("long").alias("n_removed"),
        )
    )
