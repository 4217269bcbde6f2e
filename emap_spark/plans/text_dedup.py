"""LLM-data-pipeline text operators over `documents` (BASELINE.json
north_star): token/quality/lang analysis, exact dedup, n-gram Jaccard
near-dup, MinHash+LSH, SimHash, fingerprinting.

Portability: everything is computed with engine-built-ins shared by
Spark and DuckDB (split, md5, list/array lambdas, integer arithmetic),
so the oracle checks are exact. md5 is the cross-engine hash.

Scale notes: the shingle self-join (q45) is the quadratic baseline kept
for oracle verification; the production path at 100 TB is q46/q47
MinHash banding, which replaces the all-pairs join with an
O(n x bands) bucket join. All token work happens on arrays inside
whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from emap_spark.plans._util import davg, dsum, sql_davg, sql_dsum
from emap_spark.registry import register
from emap_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
JACCARD_THRESHOLD = 0.9
N_MINHASH = 8  # 2 bands x 4 rows
SIMHASH_BITS = 16

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Parallelism must follow COMPUTE, not input bytes: the documents
    # table compresses to well under one split, so Spark's size-based
    # splitting would run the whole shingle/minhash/md5 pipeline in ONE
    # task with every other core idle. One cheap round-robin shuffle of
    # the raw text fans the compute across the cluster. (At 100 TB the
    # file count provides the splits and this repartition coalesces into
    # the scan's natural parallelism — it protects exactly the small-
    # input/heavy-compute corner where size-based splitting fails.)
    return d.repartition(spark.sparkContext.defaultParallelism)


def _words(df: DataFrame) -> DataFrame:
    return df.withColumn("w", F.split(F.col("text"), " "))


# --------------------------------------------------------------------------
# q40: token statistics (token counting operator)
# --------------------------------------------------------------------------
@register(
    "q40_token_stats",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       len(text) AS n_chars_actual,
       round(list_sum(list_transform(string_split(text, ' '), t -> len(t)))::DOUBLE
             / len(string_split(text, ' ')), 4) AS avg_token_len
FROM documents
""",
    doc="Whitespace tokenization + per-doc stats, array-native.",
)
def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _words(_docs(spark, sf_dir))
    tok_lens = F.expr("transform(w, t -> length(t))")
    return d.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.round(
            F.expr("aggregate(transform(w, t -> length(t)), 0L, (acc, x) -> acc + x)").cast(
                "double"
            )
            / F.size("w"),
            4,
        ).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# q41: quality scoring (stopword ratio + length prior)
# --------------------------------------------------------------------------
@register(
    "q41_quality_score",
    oracle=f"""
SELECT doc_id,
       round(len(list_filter(string_split(text, ' '), t -> t IN ({_SW_SQL})))::DOUBLE
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       round(
         0.5 * (len(list_filter(string_split(text, ' '), t -> t IN ({_SW_SQL})))::DOUBLE
                / len(string_split(text, ' ')))
         + 0.5 * (least(len(string_split(text, ' ')), 100)::DOUBLE / 100), 6) AS quality_score
FROM documents
""",
    doc="Heuristic quality score: stopword ratio blended with length prior.",
)
def q41_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _words(_docs(spark, sf_dir))
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(f"size(filter(w, t -> t IN ({sw})))").cast("double")
    n_tok = F.size("w")
    ratio = n_stop / n_tok
    return d.select(
        "doc_id",
        F.round(ratio, 6).alias("stopword_ratio"),
        F.round(
            0.5 * ratio + 0.5 * (F.least(n_tok, F.lit(100)).cast("double") / 100), 6
        ).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# q42: language-ID profile (stopword-score heuristic vs labeled lang)
# --------------------------------------------------------------------------
@register(
    "q42_lang_source_profile",
    oracle=f"""
SELECT lang, source,
       count(*) AS n_docs,
       {sql_dsum('n_chars')} AS total_chars,
       {sql_davg('n_chars')} AS avg_chars,
       count(DISTINCT md5(text)) AS n_unique_texts
FROM documents
GROUP BY lang, source
""",
    doc="Corpus profile per (lang, source); dedup-aware counts.",
)
def q42_lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dsum("n_chars").alias("total_chars"),
        davg("n_chars").alias("avg_chars"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique_texts"),
    )


# --------------------------------------------------------------------------
# q43: exact dedup — duplicate groups (hash groupBy)
# --------------------------------------------------------------------------
@register(
    "q43_exact_dup_groups",
    oracle="""
WITH seeded AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 5)
)
SELECT md5(text) AS text_hash, count(*) AS group_size,
       min(doc_id) AS canonical_doc_id, max(doc_id) AS last_doc_id
FROM seeded
GROUP BY md5(text)
HAVING count(*) > 1
""",
    doc=(
        "Exact dedup: hash-groupBy duplicate groups with canonical pick. "
        "The sf corpus has no exact duplicates, so 5 known copies are "
        "seeded (identically in Spark and oracle) — the operator's "
        "POSITIVE path is what the gate proves, not a vacuous 0=0."
    ),
)
def q43_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dups = (
        d.orderBy("doc_id")
        .limit(5)
        .select((F.col("doc_id") + 10000000).alias("doc_id"), "text")
    )
    return (
        d.unionByName(dups)
        .groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .filter(F.col("group_size") > 1)
    )


# --------------------------------------------------------------------------
# q44: exact dedup — surviving set
# --------------------------------------------------------------------------
@register(
    "q44_dedup_survivors",
    oracle="""
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
    doc="Exact dedup keep-first: one survivor per distinct text.",
)
def q44_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy(F.md5(F.col("text").cast("binary"))).agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


_SHINGLE_SQL = """
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


_SHINGLE_EXPR = (
    "array_distinct(transform(sequence(1, size(w)-2),"
    " i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"
)


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingle ARRAYS per doc (un-exploded; the cheap
    input for candidate verification)."""
    d = _words(_docs(spark, sf_dir))
    return d.select("doc_id", F.expr(_SHINGLE_EXPR).alias("sh"))


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingles per doc (n-gram shingling operator)."""
    d = _words(_docs(spark, sf_dir))
    return d.select("doc_id", F.explode(F.expr(_SHINGLE_EXPR)).alias("s"))


# --------------------------------------------------------------------------
# q45: n-gram Jaccard near-dup pairs (exact quadratic baseline)
# --------------------------------------------------------------------------
@register(
    "q45_jaccard_near_dup_pairs",
    oracle=f"""
WITH sh AS ({_SHINGLE_SQL}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_common,
       round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
""",
    doc=(
        "Exact shingle-set Jaccard via self-join on shingles (integer-exact). "
        "Quadratic baseline; q47 is the LSH scale path."
    ),
)
def q45_jaccard_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn(
            "jaccard_raw",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
    )
    return j.select(
        "doc_a", "doc_b", "n_common", F.round("jaccard_raw", 6).alias("jaccard")
    )


def _minhash_cols(n_hashes: int = N_MINHASH) -> list:
    """MinHash signature: h_i = min over shingles of md5(i || ':' || s).

    Lexicographic min over hex strings is a valid random-permutation
    proxy, and md5 is identical in both engines, so signatures are
    cross-engine exact.
    """
    return [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")).cast("binary"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]


# Parameterized MinHash/LSH operators (the production API). The
# registered oracle queries below run them at toy width (8 hashes /
# 2 bands — sized so the DuckDB oracle SQL stays writable); production
# defaults are 128 hashes / 16 bands (~0.9 Jaccard threshold knee).
PROD_MINHASH = 128
PROD_BANDS = 16


def minhash_signatures(shingles: DataFrame, n_hashes: int = PROD_MINHASH) -> DataFrame:
    """(doc_id, s) exploded shingles -> one row per doc with h0..h{n-1}.

    Deliberately the exploded groupBy-min fold, NOT a per-row
    array_min(transform(...)) projection. Re-measured in r9 after a plan
    audit showed the band self-join's sides no longer share the
    aggregation exchange (one side is planned as a BroadcastExchange at
    bench scale — 0 ReusedExchange in the executed q57 plan, the whole
    explode->sort-aggregate subtree runs twice): the projection form
    STILL loses, 2-3x slower end-to-end (q47 min 2.411 vs 5.212 s, q57
    1.527 vs 5.408, interleaved 0/5 + 0/5 reps). min(string) plans a
    sort-aggregate but runs inside whole-stage codegen, while
    transform/array_min higher-order lambdas are evaluated interpreted
    per element — 8 interpreted md5 lambdas per shingle cost far more
    than the codegen'd aggregate plus its doc_id exchange."""
    return shingles.groupBy("doc_id").agg(*_minhash_cols(n_hashes))


def lsh_band_keys(sig: DataFrame, n_hashes: int, n_bands: int) -> DataFrame:
    """Signature -> (doc_id, bkey) band keys, one exchange: the band
    array is exploded from a single aggregated signature subtree."""
    rows_per = n_hashes // n_bands
    keys = [
        F.md5(
            F.concat(*[F.col(f"h{b * rows_per + r}") for r in range(rows_per)]).cast(
                "binary"
            )
        )
        for b in range(n_bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*keys)).alias("bkey"))


def lsh_candidate_pairs(
    shingles: DataFrame, n_hashes: int = PROD_MINHASH, n_bands: int = PROD_BANDS
) -> DataFrame:
    """Docs sharing >=1 LSH band — the linear-shuffle candidate join
    (bucket equi-join on bkey; at 100 TB bkey doubles as the partition
    key so each bucket joins co-located).

    The self-join carries a MERGE hint (deliberate join-strategy choice,
    optimization guide §3.1): below the broadcast threshold the planner
    otherwise picks a BroadcastHashJoin whose build side re-runs the
    ENTIRE signature pipeline (shingle explode + n_hashes md5 min
    aggregates) serialized behind a driver-side relation build, while
    the sort-merge form runs both sides' map stages concurrently and
    shuffles only the narrow (doc_id, bkey) rows. Measured r9 (sf0.1,
    one JVM, steady-state): broadcast 2.15-3.5 s vs merge 1.40-1.53 s
    per pass; interleaved fresh-JVM A/B in plans/r09/. At 100 TB both
    sides exceed the threshold and SMJ is what the planner picks anyway,
    so the hint only pins the small-scale plan to the scale shape.
    SHUFFLE_HASH measured slightly faster still (1.0-1.1 s) but builds a
    per-partition hash table of band rows — the hot-bucket OOM shape the
    capped q112 variant exists to avoid; SMJ spills gracefully instead."""
    bands = lsh_band_keys(minhash_signatures(shingles, n_hashes), n_hashes, n_bands)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b.hint("merge"),
            (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verify_candidates(
    shingle_sets: DataFrame,
    candidates: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact Jaccard on CANDIDATE pairs only.

    shingle_sets: (doc_id, sh: array<string>) — the UN-exploded distinct
    shingle arrays. The intersection is computed per pair with
    `array_intersect` (hash-set semijoin inside one row), so the cost is
    two doc-id equi-joins of the small candidate set against the corpus
    — no shingle explode, no corpus-wide (doc, shingle) shuffle. At
    100 TB this is the difference between joining candidate ROWS and
    re-shuffling every shingle."""
    a = shingle_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    b = shingle_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    n_common = F.size(F.array_intersect("sa", "sb"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_common", n_common.cast("long"))
        .withColumn(
            "jaccard_raw",
            F.col("n_common").cast("double")
            / (F.size("sa") + F.size("sb") - F.col("n_common")),
        )
        .filter(F.col("jaccard_raw") >= threshold)
        .select("doc_a", "doc_b", "n_common", F.round("jaccard_raw", 6).alias("jaccard"))
    )


_MINHASH_SQL_COLS = ", ".join(
    f"min(md5('{i}:' || s)) AS h{i}" for i in range(N_MINHASH)
)


# --------------------------------------------------------------------------
# q46: MinHash signatures + LSH band keys
# --------------------------------------------------------------------------
@register(
    "q46_minhash_signatures",
    oracle=f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {_MINHASH_SQL_COLS} FROM sh GROUP BY doc_id)
SELECT doc_id,
       md5(h0 || h1 || h2 || h3) AS band0,
       md5(h4 || h5 || h6 || h7) AS band1,
       h0, h7
FROM sig
""",
    doc="MinHash(8) signatures folded into 2 LSH bands of 4 rows.",
)
def q46_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(_shingles(spark, sf_dir), N_MINHASH)
    return sig.select(
        "doc_id",
        F.md5(F.concat("h0", "h1", "h2", "h3").cast("binary")).alias("band0"),
        F.md5(F.concat("h4", "h5", "h6", "h7").cast("binary")).alias("band1"),
        "h0",
        "h7",
    )


# --------------------------------------------------------------------------
# q47: MinHash LSH candidate pairs (the 100 TB dedup path)
# --------------------------------------------------------------------------
@register(
    "q47_minhash_lsh_pairs",
    oracle=f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {_MINHASH_SQL_COLS} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h0 || h1 || h2 || h3) AS bkey FROM sig
  UNION ALL
  SELECT doc_id, md5(h4 || h5 || h6 || h7) AS bkey FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
""",
    doc=(
        "LSH banding: candidate pairs share at least one band — replaces "
        "the all-pairs join with a bucket join; linear shuffle in corpus "
        "size, the production dedup plan at 100 TB."
    ),
)
def q47_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle-sized instance of the parameterized operator (8 hashes /
    # 2 bands of 4 — identical band keys to the SQL above)
    return lsh_candidate_pairs(_shingles(spark, sf_dir), N_MINHASH, 2)


# --------------------------------------------------------------------------
# q57: LSH candidates + exact verify (the full production dedup pipeline)
# --------------------------------------------------------------------------
@register(
    "q57_lsh_near_dup_verified",
    oracle=f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {_MINHASH_SQL_COLS} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h0 || h1 || h2 || h3) AS bkey FROM sig
  UNION ALL
  SELECT doc_id, md5(h4 || h5 || h6 || h7) AS bkey FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, n_common,
       round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
""",
    doc=(
        "Candidate generation (LSH banding, linear shuffle) + exact "
        "Jaccard verification restricted to candidates — the plan you "
        "actually run at 100 TB; q45's all-pairs join is oracle-only."
    ),
)
def q57_lsh_near_dup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    cands = lsh_candidate_pairs(_shingles(spark, sf_dir), N_MINHASH, 2)
    return verify_candidates(_shingle_sets(spark, sf_dir), cands)


# --------------------------------------------------------------------------
# q48: SimHash (16-bit, token-multiset)
# --------------------------------------------------------------------------
_SIMHASH_HI = "('8','9','a','b','c','d','e','f')"


def _simhash_sql() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN substr(md5(t), {j + 1}, 1) IN {_SIMHASH_HI} THEN 1 ELSE -1 END)"
        f" AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    assemble = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS))
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
bits AS (SELECT doc_id, {bit_sums} FROM toks GROUP BY doc_id)
SELECT doc_id, ({assemble})::BIGINT AS simhash FROM bits
"""


# production sizing: 32 bits (one per md5 hex char — the ceiling of this
# hex-digit vote scheme; beyond 32 switch to per-4-bit nibble extraction)
PROD_SIMHASH_BITS = 32


def simhash(docs: DataFrame, bits: int = PROD_SIMHASH_BITS) -> DataFrame:
    """(doc_id, text) -> (doc_id, simhash): per bit position, sign of the
    summed +/-1 votes from each token's md5 hex digit.

    ZERO-shuffle: each token is hashed ONCE into a per-row md5 array,
    then the 32 bit votes are sequential array folds inside the same
    projection — no explode (the row count never multiplies by token
    count) and no groupBy exchange. The previous explode+groupBy form
    measured ~2x slower at sf0.1 and shuffled the whole token stream;
    at 100 TB this version is a pure map over the corpus."""
    assert bits <= 32, "hex-digit vote scheme yields at most 32 bits"
    hi = "('8','9','a','b','c','d','e','f')"
    votes = [
        f"aggregate(hs, 0, (a, h) ->"
        f" a + IF(substr(h, {j + 1}, 1) IN {hi}, 1, -1))"
        for j in range(bits)
    ]
    assemble = " + ".join(
        f"IF({v} > 0, {1 << j}L, 0L)" for j, v in enumerate(votes)
    )
    return docs.select(
        "doc_id",
        F.expr("transform(split(text, ' '), t -> md5(cast(t as binary)))").alias("hs"),
    ).select("doc_id", F.expr(f"cast(({assemble}) as long)").alias("simhash"))


@register(
    "q48_simhash",
    oracle=_simhash_sql(),
    doc=(
        "SimHash fingerprint: per bit position, sign of the sum of "
        "+/-1 votes from each token's md5 bit; near-dups differ in few bits."
    ),
)
def q48_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir), SIMHASH_BITS)  # oracle-sized


# --------------------------------------------------------------------------
# q49: document fingerprint (min-hash of 2-gram rolling windows)
# --------------------------------------------------------------------------
@register(
    "q49_doc_fingerprint",
    oracle="""
SELECT doc_id,
       min(md5(s)) AS fingerprint,
       count(DISTINCT s) AS n_windows
FROM (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
         i -> w[i] || ' ' || w[i+1])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
GROUP BY doc_id
""",
    doc="Winnowing-style fingerprint: min hash over rolling 2-gram windows.",
)
def q49_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # zero-shuffle (same trick as simhash): the rolling windows live in a
    # per-row array, so min-hash and distinct-count are array folds in
    # one projection — no explode, no groupBy exchange; a pure map over
    # the corpus at any scale
    d = _words(_docs(spark, sf_dir))
    grams = "transform(sequence(1, size(w)-1), i -> concat_ws(' ', w[i-1], w[i]))"
    return d.select(
        "doc_id",
        F.expr(
            f"array_min(transform({grams}, s -> md5(cast(s as binary))))"
        ).alias("fingerprint"),
        F.expr(f"size(array_distinct({grams}))").cast("long").alias("n_windows"),
    )


# --------------------------------------------------------------------------
# q55: global token frequencies (explode + aggregate)
# --------------------------------------------------------------------------
@register(
    "q55_token_frequencies",
    oracle="""
SELECT t AS token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
GROUP BY t
""",
    doc="Corpus vocabulary with document frequencies (explode + two-level counts).",
)
def q55_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# q56: similarity of every doc to a fixed query (search shape)
# --------------------------------------------------------------------------
_QUERY_TEXT = "the fast query scan join group filter"


@register(
    "q56_query_similarity_ranking",
    oracle=f"""
WITH qt AS (SELECT list_distinct(string_split('{_QUERY_TEXT}', ' ')) AS qw),
d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS dw FROM documents)
SELECT doc_id,
       len(list_filter(dw, t -> list_contains(qw, t))) AS n_common,
       round(len(list_filter(dw, t -> list_contains(qw, t)))::DOUBLE
             / (len(dw) + len(qw) - len(list_filter(dw, t -> list_contains(qw, t)))), 6) AS jaccard_to_query
FROM d, qt
ORDER BY jaccard_to_query DESC, doc_id
LIMIT 25
""",
    doc="Keyword-search ranking: per-doc Jaccard against a fixed query term set.",
)
def q56_query_similarity_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _words(_docs(spark, sf_dir))
    qw = sorted(set(_QUERY_TEXT.split(" ")))
    qlit = ", ".join(f"'{w}'" for w in qw)
    dw = F.array_distinct(F.col("w"))
    common = F.expr(
        f"size(filter(array_distinct(w), t -> array_contains(array({qlit}), t)))"
    )
    jac = F.round(
        common.cast("double") / (F.size(dw) + F.lit(len(qw)) - common), 6
    )
    return (
        d.select("doc_id", common.alias("n_common"), jac.alias("jaccard_to_query"))
        .orderBy(F.col("jaccard_to_query").desc(), F.col("doc_id"))
        .limit(25)
        .select("doc_id", F.col("n_common").cast("long").alias("n_common"), "jaccard_to_query")
    )


# --------------------------------------------------------------------------
# q106: LSH parameter sweep — the banding-config tuner for dedup pipelines
# --------------------------------------------------------------------------
_SWEEP_CONFIGS = [
    ("1x8", [list(range(8))]),
    ("2x4", [[0, 1, 2, 3], [4, 5, 6, 7]]),
    ("4x2", [[0, 1], [2, 3], [4, 5], [6, 7]]),
]


def _sweep_band_sql(cfg: str, groups: list[list[int]]) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{cfg}' AS cfg, doc_id, "
        f"md5({' || '.join(f'h{i}' for i in g)}) AS bkey FROM sig"
        for g in groups
    )


_Q106_BANDS_SQL = "\nUNION ALL\n".join(
    _sweep_band_sql(c, g) for c, g in _SWEEP_CONFIGS
)


@register(
    "q106_lsh_parameter_sweep",
    oracle=f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {_MINHASH_SQL_COLS} FROM sh GROUP BY doc_id),
bands AS ({_Q106_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.cfg, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.cfg = b.cfg AND a.bkey = b.bkey
   AND a.doc_id < b.doc_id
),
pairs AS (SELECT DISTINCT doc_a, doc_b FROM cand),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_common
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.s = a.s
  GROUP BY p.doc_a, p.doc_b
),
ver AS (
  SELECT i.doc_a, i.doc_b,
         (n_common::DOUBLE / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}) AS is_dup
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT c.cfg,
       count(*)::BIGINT AS n_candidates,
       coalesce(sum(CASE WHEN v.is_dup THEN 1 ELSE 0 END), 0)::BIGINT AS n_verified,
       round(coalesce(sum(CASE WHEN v.is_dup THEN 1 ELSE 0 END), 0)::DOUBLE
             / count(*), 6) AS precision
FROM cand c LEFT JOIN ver v ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b
GROUP BY c.cfg
ORDER BY c.cfg
""",
    doc=(
        "Fuzzy-dedup parameter sweep: the SAME 8-hash signatures banded "
        "three ways (1x8 strict .. 4x2 loose) in one pass — per config, "
        "candidate volume and exact-verify precision, the curve an "
        "operator reads to pick the banding knee before a 100 TB run. "
        "Signatures and the verify join are computed once and shared; "
        "each config adds only a band-key equi-join (linear shuffle)."
    ),
)
def q106_lsh_parameter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(_shingles(spark, sf_dir), N_MINHASH)
    band_frames = []
    for cfg, groups in _SWEEP_CONFIGS:
        keys = [
            F.md5(F.concat(*[F.col(f"h{i}") for i in g]).cast("binary"))
            for g in groups
        ]
        band_frames.append(
            sig.select(
                F.lit(cfg).alias("cfg"),
                "doc_id",
                F.explode(F.array(*keys)).alias("bkey"),
            )
        )
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionByName(bf)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.cfg") == F.col("b.cfg"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.cfg", F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify each UNIQUE pair once (exact Jaccard on candidates only,
    # the q57 shape), then attribute per config; the dup decision uses
    # the RAW ratio, matching the oracle bit-for-bit
    pairs = cand.select("doc_a", "doc_b").distinct()
    ss = _shingle_sets(spark, sf_dir)
    sa = ss.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    sb = ss.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    n_common = F.size(F.array_intersect("sa", "sb")).cast("double")
    ver = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                n_common / (F.size("sa") + F.size("sb") - n_common)
                >= JACCARD_THRESHOLD
            ).alias("is_dup"),
        )
    )
    return (
        cand.join(ver, ["doc_a", "doc_b"], "left")
        .groupBy("cfg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.coalesce(
                F.sum(F.when(F.col("is_dup"), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_verified"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("is_dup"), 1).otherwise(0)), F.lit(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("precision"),
        )
        .orderBy("cfg")
    )


# --------------------------------------------------------------------------
# q107: normalized (cross-variant) dedup — catches case/punctuation copies
# --------------------------------------------------------------------------
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)


@register(
    "q107_normalized_dup_groups",
    oracle=f"""
WITH seeded AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000000, upper(text)
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 3)
  UNION ALL
  SELECT doc_id + 30000000, text || '!!!'
  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 2)
)
SELECT md5({_NORM_SQL.format(c='text')}) AS norm_hash,
       count(*) AS group_size,
       min(doc_id) AS canonical_doc_id,
       count(DISTINCT md5(text)) AS n_exact_variants
FROM seeded
GROUP BY 1
HAVING count(*) > 1
""",
    doc=(
        "Normalization-aware dedup: lowercase, strip non-alphanumerics, "
        "collapse whitespace, THEN hash-group — finds the case/"
        "punctuation copies exact dedup (q43) misses. 3 uppercase and 2 "
        "punctuation variants are seeded identically in both engines; "
        "n_exact_variants > 1 proves each group is invisible to the "
        "exact hash. Same hash-groupBy scale shape as q43."
    ),
)
def q107_normalized_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    head3 = d.orderBy("doc_id").limit(3).select(
        (F.col("doc_id") + 20000000).alias("doc_id"), F.upper("text").alias("text")
    )
    head2 = d.orderBy("doc_id").limit(2).select(
        (F.col("doc_id") + 30000000).alias("doc_id"),
        F.concat("text", F.lit("!!!")).alias("text"),
    )
    seeded = d.unionByName(head3).unionByName(head2)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        seeded.select("doc_id", F.md5(norm.cast("binary")).alias("norm_hash"),
                      F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .groupBy("norm_hash")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.countDistinct("text_hash").alias("n_exact_variants"),
        )
        .filter(F.col("group_size") > 1)
    )


# --------------------------------------------------------------------------
# q108: near-dup clustering + survivor selection (the step that actually
# deduplicates a corpus: LSH pairs -> connected components -> keep one)
# --------------------------------------------------------------------------
def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(doc_a, doc_b) undirected edges -> (doc_id, cluster_id) with
    cluster_id = the component's smallest member.

    Min-label propagation: each round every node takes the smallest
    label among itself and its neighbors; converges in O(component
    diameter) rounds — near-dup components are dense and shallow (dup
    families, not long chains), so 2-3 rounds in practice. The driver
    loop is bounded and exits on fixpoint, mirroring the sanctioned
    identity-closure loop (operators/identity.py); every round cuts
    lineage. At 100 TB this is the standard big-CC recipe (the
    large-star/small-star refinement drops in if diameters ever grow)."""
    from emap_spark.lineage import cut

    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("b"), F.col("cluster_id").alias("nl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nl"))
            .withColumnRenamed("a", "doc_id")
        )
        new = cut(
            labels.join(nbr, "doc_id", "left").select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nl"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        converged = new.alias("x").join(
            labels.alias("y"),
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.cluster_id") != F.col("y.cluster_id")),
            "left_semi",
        ).isEmpty()
        labels = new
        if converged:
            break
    return labels


def near_dup_survivors(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """The production dedup API: docs minus every near-dup cluster's
    non-survivors (survivor = smallest doc_id per component).

    The removed set scales with the corpus dup rate — at 100 TB a
    typical 20-50% near-dup fraction makes it many GB, so forcing a
    broadcast here would OOM the driver/executors (VERDICT r4 #2).
    No join hint: AQE decides at runtime — a small removed set still
    gets a broadcast anti-join from the size threshold; a large one
    falls back to a shuffled anti-join, which is the correct plan."""
    cc = connected_components(pairs)
    removed = cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(removed, "doc_id", "left_anti")


@register(
    "q108_near_dup_clusters",
    oracle=f"""
WITH RECURSIVE sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {_MINHASH_SQL_COLS} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h0 || h1 || h2 || h3) AS bkey FROM sig
  UNION ALL
  SELECT doc_id, md5(h4 || h5 || h6 || h7) AS bkey FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY c.doc_a, c.doc_b
),
dup AS (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM dup
  UNION SELECT doc_b, doc_a FROM dup
),
reach(a, b) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
),
cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
SELECT cluster_id,
       count(*)::BIGINT AS n_docs,
       cluster_id AS survivor_doc_id,
       (count(*) - 1)::BIGINT AS n_removed
FROM cc
GROUP BY cluster_id
HAVING count(*) > 1
""",
    doc=(
        "Near-dup CLUSTERING over verified LSH pairs (q57's output) via "
        "min-label connected components, with one survivor per cluster "
        "(smallest doc_id) — the operation that actually shrinks a "
        "training corpus. The oracle computes components by recursive "
        "transitive closure; Spark uses bounded min-label propagation "
        "(O(diameter) rounds, the sanctioned driver loop)."
    ),
)
def q108_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cands = lsh_candidate_pairs(_shingles(spark, sf_dir), N_MINHASH, 2)
    dup_pairs = verify_candidates(_shingle_sets(spark, sf_dir), cands).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(dup_pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select(
            "cluster_id",
            "n_docs",
            F.col("cluster_id").alias("survivor_doc_id"),
            (F.col("n_docs") - 1).cast("long").alias("n_removed"),
        )
    )


# --------------------------------------------------------------------------
# q109: BPE-ish regex tokenization (the second tokenizer from the north
# star: whitespace counting is q40; this splits GPT-style — letter runs,
# digit runs, single punctuation — the pre-tokenization BPE vocabularies
# are trained over)
# --------------------------------------------------------------------------
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "q109_bpe_regex_tokens",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS n_distinct_bpe,
       len(list_filter(regexp_extract_all(text, '{_BPE_RE}'),
                       t -> regexp_matches(t, '^[0-9]+$'))) AS n_number_runs,
       round(len(regexp_extract_all(text, '{_BPE_RE}'))::DOUBLE
             / len(string_split(text, ' ')), 6) AS bpe_per_word
FROM documents
""",
    doc=(
        "BPE-style pre-tokenization counts: letter runs / digit runs / "
        "single punctuation via one regex shared verbatim by both "
        "engines — token-budget estimation for an LLM corpus (the "
        "whitespace counter q40 underestimates subword token cost). "
        "Pure column expressions; one scan, no shuffle."
    ),
)
def q109_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_bpe"),
        F.size(
            F.expr(f"filter(regexp_extract_all(text, '{_BPE_RE}', 0), t -> t rlike '^[0-9]+$')")
        ).cast("long").alias("n_number_runs"),
        F.round(
            F.size(toks).cast("double") / F.size(F.split("text", " ")), 6
        ).alias("bpe_per_word"),
    )


# --------------------------------------------------------------------------
# q112: hot-bucket-capped LSH candidates (the skew guard at corpus scale)
# --------------------------------------------------------------------------
# At 100 TB a degenerate band key — boilerplate pages, templated spam,
# the exact-duplicate mass that q43/q44 already collapses — produces an
# LSH bucket with millions of members, and the band self-join goes
# quadratic IN THAT BUCKET (10^6 members -> 10^12 pairs from one key).
# Production dedup systems cap bucket width: a bucket wider than the cap
# is, by construction, dominated by exact/near-exact duplicates that the
# exact-dedup pass handles at linear cost, so the LSH pass skips it.
# The cap bounds the join at O(corpus x max_bucket) — the knob that
# keeps banded LSH linear no matter how skewed the corpus is.
MAX_BUCKET = 2  # oracle sizing (sf0.01 buckets reach 3); production ~500


def lsh_candidate_pairs_capped(
    shingles: DataFrame,
    n_hashes: int = PROD_MINHASH,
    n_bands: int = PROD_BANDS,
    max_bucket: int = 500,
) -> DataFrame:
    """Capped candidate generation — and the cap BUYS a better plan
    than q47's self-join: because every surviving bucket is at most
    max_bucket wide, the bucket's members fit in one aggregation row,
    so pairs are generated BUCKET-LOCALLY (groupBy bkey -> member
    array -> explode i<j combinations). One shuffle of (doc_id, bkey)
    total, versus the self-join's TWO full band-pipeline subtrees
    (Spark cannot reuse the exchange across self-join sides here) —
    and per-bucket memory is bounded at max_bucket ids by
    construction, which is exactly what an UNcapped collect could not
    guarantee."""
    bands = lsh_band_keys(minhash_signatures(shingles, n_hashes), n_hashes, n_bands)
    buckets = (
        bands.groupBy("bkey")
        .agg(F.collect_list("doc_id").alias("raw"))
        # the cap counts band ROWS (mirrors the oracle's count(*) per
        # bucket); pair generation then uses the distinct sorted ids
        .filter(F.size("raw") <= max_bucket)
        .select(F.array_sort(F.array_distinct("raw")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(ids, (x, i) ->"
            " transform(slice(ids, i + 2, size(ids)),"
            " y -> struct(x AS doc_a, y AS doc_b))))"
        )
    )
    return buckets.select(pair.alias("p")).select("p.doc_a", "p.doc_b").distinct()


@register(
    "q112_lsh_bucket_cap",
    oracle=f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {_MINHASH_SQL_COLS} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h0 || h1 || h2 || h3) AS bkey FROM sig
  UNION ALL
  SELECT doc_id, md5(h4 || h5 || h6 || h7) AS bkey FROM sig
),
kept AS (
  SELECT doc_id, bkey FROM (
    SELECT doc_id, bkey, count(*) OVER (PARTITION BY bkey) AS bn FROM bands
  ) WHERE bn <= {MAX_BUCKET}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM kept a JOIN kept b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
""",
    doc=(
        "LSH banding with a hot-bucket width cap: buckets wider than "
        "max_bucket (exact-duplicate mass, handled by q43/q44 at linear "
        "cost) are skipped, bounding candidate volume at O(corpus x "
        "cap) regardless of skew — and the cap makes bucket-LOCAL pair "
        "generation safe (members fit one agg row), so the plan is one "
        "shuffle instead of the self-join's two band subtrees."
    ),
)
def q112_lsh_bucket_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs_capped(
        _shingles(spark, sf_dir), N_MINHASH, 2, MAX_BUCKET
    )


# --------------------------------------------------------------------------
# q113: incremental corpus dedup — dedupe an incoming BATCH against the
# standing corpus (the continuous-ingestion production shape)
# --------------------------------------------------------------------------
def lsh_incremental_matches(
    batch_shingles: DataFrame,
    corpus_shingles: DataFrame,
    batch_sets: DataFrame,
    corpus_sets: DataFrame,
    n_hashes: int = PROD_MINHASH,
    n_bands: int = PROD_BANDS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """New-batch-vs-corpus near-dup decision: band keys of the incoming
    batch equi-join the CORPUS band index (in production a table
    bucketed/partitioned by bkey, so only the small batch side shuffles
    — the corpus is never re-hashed), candidates are verified with exact
    Jaccard on candidate rows only, and each batch doc reports its BEST
    corpus match (max Jaccard, min corpus id tie-break). This is the
    decision a continuous training-data pipeline makes per incoming doc:
    near-dup of the standing corpus -> drop/link, else admit."""
    nb = lsh_band_keys(
        minhash_signatures(batch_shingles, n_hashes), n_hashes, n_bands
    ).withColumnRenamed("doc_id", "doc_id_b")
    cb = lsh_band_keys(
        minhash_signatures(corpus_shingles, n_hashes), n_hashes, n_bands
    ).withColumnRenamed("doc_id", "dup_of")
    cand = nb.join(cb, "bkey").select(
        F.col("doc_id_b").alias("doc_id"), "dup_of"
    ).distinct()
    a = batch_sets.select("doc_id", F.col("sh").alias("sa"))
    b = corpus_sets.select(F.col("doc_id").alias("dup_of"), F.col("sh").alias("sb"))
    n_common = F.size(F.array_intersect("sa", "sb"))
    scored = (
        cand.join(a, "doc_id")
        .join(b, "dup_of")
        .withColumn("n_common", n_common.cast("long"))
        .withColumn(
            "jaccard_raw",
            F.col("n_common").cast("double")
            / (F.size("sa") + F.size("sb") - F.col("n_common")),
        )
        .filter(F.col("jaccard_raw") >= threshold)
    )
    w = W.partitionBy("doc_id").orderBy(F.col("jaccard_raw").desc(), F.col("dup_of"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "doc_id", "dup_of", "n_common",
            F.round("jaccard_raw", 6).alias("jaccard"),
        )
    )


@register(
    "q113_incremental_corpus_dedup",
    oracle=f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {_MINHASH_SQL_COLS} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h0 || h1 || h2 || h3) AS bkey FROM sig
  UNION ALL
  SELECT doc_id, md5(h4 || h5 || h6 || h7) AS bkey FROM sig
),
cand AS (
  SELECT DISTINCT n.doc_id, c.doc_id AS dup_of
  FROM bands n JOIN bands c ON n.bkey = c.bkey
  WHERE n.doc_id % 10 = 5 AND c.doc_id % 10 <> 5
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT cand.doc_id, cand.dup_of, count(*) AS n_common
  FROM cand
  JOIN sh a ON a.doc_id = cand.doc_id
  JOIN sh b ON b.doc_id = cand.dup_of AND b.s = a.s
  GROUP BY cand.doc_id, cand.dup_of
),
scored AS (
  SELECT i.doc_id, i.dup_of, i.n_common,
         i.n_common::DOUBLE / (sa.n + sb.n - i.n_common) AS jaccard_raw
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_id
  JOIN sizes sb ON sb.doc_id = i.dup_of
  WHERE i.n_common::DOUBLE / (sa.n + sb.n - i.n_common) >= {JACCARD_THRESHOLD}
)
SELECT doc_id, dup_of, n_common, round(jaccard_raw, 6) AS jaccard
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY jaccard_raw DESC, dup_of) AS rk
  FROM scored
) WHERE rk = 1
""",
    doc=(
        "Incremental dedup: an incoming batch (doc_id % 10 = 5 stands in "
        "for the new partition) LSH-joins the standing corpus's band "
        "index and each batch doc reports its best verified corpus "
        "match. At 100 TB the corpus band index is bucketed by bkey, so "
        "only the (small) batch side shuffles — the standing corpus is "
        "never re-hashed per batch."
    ),
)
def q113_incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    is_batch = F.col("doc_id") % 10 == 5
    sh = _shingles(spark, sf_dir)
    ss = _shingle_sets(spark, sf_dir)
    return lsh_incremental_matches(
        sh.filter(is_batch), sh.filter(~is_batch),
        ss.filter(is_batch), ss.filter(~is_batch),
        N_MINHASH, 2,
    )


# --------------------------------------------------------------------------
# q116: benchmark decontamination (n-gram overlap vs a held-out set)
# --------------------------------------------------------------------------
# The training-data op every serious pipeline runs before a model sees
# the corpus: flag training documents sharing verbatim n-grams with an
# evaluation/benchmark set, so test data is removed from training data
# (the standard recipe: hash every benchmark 8-gram, broadcast the set
# — it is tiny relative to the corpus — and one scan over training
# docs counts matches; no corpus self-join, no corpus shuffle beyond
# the per-doc gram fold).
NGRAM_DECONTAM = 8
BENCHMARK_SOURCE = "src0"  # stands in for the held-out benchmark set


def _ngram_hashes(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, source, g) distinct positional n-gram md5s per doc;
    docs shorter than n tokens produce no grams (guarded: Spark's
    sequence() would run DESCENDING for a negative span)."""
    w = _words(df)
    grams = F.expr(
        f"array_distinct(transform(sequence(1, size(w) - {n - 1}),"
        f" i -> md5(concat_ws(' ', slice(w, i, {n})))))"
    )
    return (
        w.withColumn("g", F.when(F.size("w") >= n, grams).otherwise(F.array()))
        .select("doc_id", "source", F.explode("g").alias("g"))
    )


def decontaminate(
    docs: DataFrame, benchmark_source: str = BENCHMARK_SOURCE, n: int = NGRAM_DECONTAM
) -> DataFrame:
    """Training docs (source != benchmark) that share at least one
    verbatim n-gram with the benchmark set, with hit counts and the
    contaminated fraction of the doc's distinct grams. The benchmark
    gram set is broadcast (it is the small side by construction)."""
    grams = _ngram_hashes(docs, n)
    bench = (
        grams.filter(F.col("source") == benchmark_source).select("g").distinct()
    )
    train = grams.filter(F.col("source") != benchmark_source)
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_hit",
            "n_grams",
            # Raw IEEE ratio, not round(): see shared_frac note.
            (F.col("n_hit") / F.col("n_grams")).alias("contam_rate"),
        )
    )


_NGRAM_SQL = (
    "list_distinct(list_transform(range(1, len(w) - {m}),"
    " i -> md5(concat_ws(' ', {parts}))))"
).format(
    m=NGRAM_DECONTAM - 2,
    parts=", ".join(f"w[i+{k}]" for k in range(NGRAM_DECONTAM)),
)


@register(
    "q116_benchmark_decontamination",
    oracle=f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, source, unnest({_NGRAM_SQL}) AS g FROM w
),
bench AS (SELECT DISTINCT g FROM g WHERE source = '{BENCHMARK_SOURCE}'),
train AS (SELECT doc_id, g FROM g WHERE source <> '{BENCHMARK_SOURCE}'),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, count(*) AS n_hit FROM train t JOIN bench USING (g)
  GROUP BY t.doc_id
)
SELECT doc_id, n_hit, n_grams,
       n_hit::DOUBLE / n_grams AS contam_rate
FROM hits JOIN sizes USING (doc_id)
""",
    doc=(
        "Benchmark decontamination: training docs sharing verbatim "
        "8-grams with the held-out set (source=src0 stands in). The "
        "benchmark gram set broadcasts; one scan over training docs — "
        "the standard pre-training decontamination pass, corpus-linear."
    ),
)
def q116_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q117: deterministic stratified mixture sampling (data mixing)
# --------------------------------------------------------------------------
# Training mixtures up/down-weight sources ("web at 0.5, books at 2
# epochs, ..."). The sampling must be DETERMINISTIC (reproducible runs,
# resumable jobs) and shuffle-free: keep a doc iff a hash of its id
# falls below the source's rate — one scan, no state, identical on any
# cluster size. Rates here derive from the source suffix (src13 ->
# (13 % 4 + 1)/4) as a stand-in for a supplied mixture table, which at
# scale is a broadcast join instead of the inline expression.
def mixture_sample(docs: DataFrame, rate: Column | None = None) -> DataFrame:
    """Deterministic per-source downsample: md5(doc_id) as a uniform
    [0,1) draw (first 8 hex digits / 2^32 — identical in any engine
    with md5), kept iff below the source's rate."""
    if rate is None:
        rate = (
            (F.substring("source", 4, 10).cast("int") % 4 + 1) / F.lit(4.0)
        )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.withColumn("__rate", rate)
        .filter(u < F.col("__rate"))
        .select("doc_id", "source", F.round("__rate", 6).alias("rate"))
    )


@register(
    "q117_mixture_sample",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         (substr(source, 4)::INT % 4 + 1) / 4.0 AS rate,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, source, round(rate, 6) AS rate FROM d WHERE u < rate
""",
    doc=(
        "Deterministic stratified mixture sampling: per-source keep "
        "rates applied via an md5-of-id uniform draw — reproducible, "
        "stateless, one scan, no shuffle; the data-mixing primitive "
        "for training-corpus assembly."
    ),
)
def q117_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_sample(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q118: verbatim span self-overlap (the exact-substring dedup signal)
# --------------------------------------------------------------------------
# Near-dup dedup (q47/q57/q108) removes whole documents; production
# pipelines ALSO measure verbatim span overlap INSIDE the surviving
# corpus (boilerplate, quotations, mirrored passages) and trim or
# down-weight documents dominated by text that exists elsewhere. This
# is the span-granular, Spark-shaped form of exact-substring dedup:
# hash every positional n-gram, count how many docs carry each span
# (one explode + one groupBy), and join the counts back (on the same
# key the groupBy just partitioned by — exchange-reused, corpus-linear;
# no suffix array, no self-join).
def span_overlap_report(docs: DataFrame, n: int = NGRAM_DECONTAM) -> DataFrame:
    """Per doc: distinct n-gram spans, how many also appear in >=1
    OTHER doc, and the shared fraction — the trim/down-weight signal."""
    grams = _ngram_hashes(docs, n).select("doc_id", "g")
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    per_doc = (
        grams.join(counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_shared",
        # Raw IEEE division (no round): Spark round() is BigDecimal
        # HALF_UP while DuckDB round() is scaled-double — they can
        # differ in the last ulp; a raw long/long -> double cannot.
        (F.col("n_shared") / F.col("n_spans")).alias("shared_frac"),
    )


@register(
    "q118_span_self_overlap",
    oracle=f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, unnest({_NGRAM_SQL}) AS g FROM w),
cnt AS (SELECT g, count(*) AS nd FROM g GROUP BY g)
SELECT doc_id,
       count(*) AS n_spans,
       sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*)
         AS shared_frac
FROM g JOIN cnt USING (g)
GROUP BY doc_id
""",
    doc=(
        "Verbatim 8-gram span self-overlap per document — the "
        "exact-substring dedup signal (boilerplate/quotation mass) "
        "used to trim or down-weight docs dominated by text that "
        "exists elsewhere. One explode + one groupBy + a counts join "
        "on the groupBy's own partitioning: corpus-linear."
    ),
)
def q118_span_self_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_overlap_report(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q119: character-trigram language ID (the n-gram classifier)
# --------------------------------------------------------------------------
# q42 profiles the corpus BY its language label; this is the classifier
# that PRODUCES such a label: per-language character-trigram profiles
# (top-K trigrams by frequency, learned from a labeled train split) are
# broadcast, every document's own top trigrams join them, and the
# predicted language is the profile sharing the most — the CLD-style
# n-gram recipe. Corpus-linear: one trigram explode + two bounded
# groupBys; the profile side is K x n_languages rows, always broadcast.
LANG_TOP_K = 40


def _char_trigrams(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 0)),"
                " i -> substring(text, i, 3))"
            )
        ).alias("tg"),
    )


def lang_ngram_id(docs: DataFrame, top_k: int = LANG_TOP_K) -> DataFrame:
    """Predict each doc's language by top-trigram overlap with
    per-language profiles learned from the train split (doc_id % 5 != 0
    — so every doc, train or held-out, gets a prediction from profiles
    it did not fully determine). Deterministic: trigram ranks tie-break
    lexicographically, language argmax ties break alphabetically."""
    tg = _char_trigrams(docs)
    wd = W.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("tg"))
    doc_top = (
        tg.groupBy("doc_id", "tg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("__rk", F.row_number().over(wd))
        .filter(F.col("__rk") <= top_k)
        .select("doc_id", "tg")
    )
    wl = W.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("tg"))
    profile = (
        tg.filter(F.col("doc_id") % 5 != 0)
        .groupBy("lang", "tg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("__rk", F.row_number().over(wl))
        .filter(F.col("__rk") <= top_k)
        .select(F.col("lang").alias("cand_lang"), "tg")
    )
    scores = (
        doc_top.join(F.broadcast(profile), "tg")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    wbest = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang")
    )
    best = (
        scores.withColumn("__rk", F.row_number().over(wbest))
        .filter(F.col("__rk") == 1)
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"), "score")
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("predicted_lang"), F.lit("und")).alias("predicted_lang"),
            F.coalesce(F.col("score"), F.lit(0)).alias("score"),
        )
    )


@register(
    "q119_lang_ngram_id",
    oracle=f"""
WITH tg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, greatest(length(text) - 1, 1)),
                i -> substr(text, i, 3))) AS tg
  FROM documents
),
doc_top AS (
  SELECT doc_id, tg FROM (
    SELECT doc_id, tg, count(*) AS cnt,
           row_number() OVER (PARTITION BY doc_id
             ORDER BY count(*) DESC, tg) AS rk
    FROM tg GROUP BY doc_id, tg
  ) WHERE rk <= {LANG_TOP_K}
),
profile AS (
  SELECT lang AS cand_lang, tg FROM (
    SELECT lang, tg, count(*) AS cnt,
           row_number() OVER (PARTITION BY lang
             ORDER BY count(*) DESC, tg) AS rk
    FROM tg WHERE doc_id % 5 <> 0 GROUP BY lang, tg
  ) WHERE rk <= {LANG_TOP_K}
),
scores AS (
  SELECT d.doc_id, p.cand_lang, count(*) AS score
  FROM doc_top d JOIN profile p USING (tg)
  GROUP BY d.doc_id, p.cand_lang
),
best AS (
  SELECT doc_id, cand_lang AS predicted_lang, score FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, cand_lang) AS rk
    FROM scores
  ) WHERE rk = 1
)
SELECT d.doc_id, d.lang,
       coalesce(b.predicted_lang, 'und') AS predicted_lang,
       coalesce(b.score, 0) AS score
FROM documents d LEFT JOIN best b USING (doc_id)
""",
    doc=(
        "Character-trigram language ID: per-language top-40 trigram "
        "profiles (train split doc_id % 5 != 0) broadcast against every "
        "doc's own top trigrams; predicted language = most shared "
        "profile — the CLD-style n-gram classifier, corpus-linear."
    ),
)
def q119_lang_ngram_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_ngram_id(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q121: PII scrub & redact (training-corpus sanitization pass)
# --------------------------------------------------------------------------
# Pre-training corpora are scrubbed for emails / IPs / phone numbers plus
# a configurable entity dictionary before anything else touches the text.
# The operator is a pure per-row projection — regexp counts + a chained
# regexp_replace — so it is corpus-linear with zero shuffle at any scale.
# The synthetic corpus contains no real PII (the email/IP/phone counters
# prove the plumbing at zero); the entity dictionary fires on real tokens
# so the redaction path and its fingerprint are value-checked end to end.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
_PII_TERMS = r"\b(?:customer|order|vector)\b"


def pii_redact_expr(col: Column | str = "text") -> Column:
    """The redaction column: chained global regexp_replace
    (email -> ip -> phone -> entity terms). Shared by q121 and the
    streaming CorpusPrep loop so the stored corpus and the fingerprint
    use the identical transformation."""
    red = F.col(col) if isinstance(col, str) else col
    for pat, repl in (
        (_PII_EMAIL, "<EMAIL>"),
        (_PII_IPV4, "<IP>"),
        (_PII_PHONE, "<PHONE>"),
        (_PII_TERMS, "<ENTITY>"),
    ):
        red = F.regexp_replace(red, pat, repl)
    return red


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Per-doc PII hit counts + fully redacted text fingerprint.

    Identical replace order in the oracle so the md5 fingerprints match
    bit-for-bit. All engine built-ins: one scan, no shuffle, no UDFs."""
    n = lambda pat: F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
    red = pii_redact_expr()
    return docs.select(
        "doc_id",
        n(_PII_EMAIL).cast("long").alias("n_email"),
        n(_PII_IPV4).cast("long").alias("n_ipv4"),
        n(_PII_PHONE).cast("long").alias("n_phone"),
        n(_PII_TERMS).cast("long").alias("n_entity"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


@register(
    "q121_pii_scrub",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(text, '{_PII_TERMS}')) AS n_entity,
       len(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_TERMS}', '<ENTITY>', 'g')) AS redacted_len,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_TERMS}', '<ENTITY>', 'g')) AS redacted_md5
FROM documents
""",
    doc=(
        "PII scrub & redact: per-doc email/IPv4/phone/entity-dictionary "
        "hit counts plus the md5 fingerprint of the fully redacted text. "
        "Pure column expressions; one scan, no shuffle."
    ),
)
def q121_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scrub(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q122: repetition quality filters (Gopher-style, zero-shuffle)
# --------------------------------------------------------------------------
# The Gopher/MassiveText repetition rules: a document dominated by one
# word, one bigram, or by repeated word types is boilerplate/spam and is
# dropped before training. The per-doc mode of a word multiset is
# normally an explode + two groupBys (two shuffles); sorting the token
# array and taking the longest equal-run instead computes the same mode
# INSIDE one projection (the q48/q49 zero-shuffle recipe) — the corpus
# never leaves its scan partitions.
def _run_stats(arr):
    """(max_run, dup_count) over a SORTED array via one sequential fold:
    max_run = the multiset's mode count; dup_count = total elements whose
    type occurs >= 2 times."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("mx"),
        F.lit(0).alias("dup"),
    )

    def step(acc, w):
        run2 = F.when(acc["prev"] == w, acc["run"] + 1).otherwise(F.lit(1))
        closed = F.when(
            (acc["prev"] != w) & (acc["run"] >= 2), acc["run"]
        ).otherwise(F.lit(0))
        return F.struct(
            w.alias("prev"),
            run2.alias("run"),
            F.greatest(acc["mx"], run2).alias("mx"),
            (acc["dup"] + closed).alias("dup"),
        )

    def fin(acc):
        return F.struct(
            acc["mx"].alias("mx"),
            (
                acc["dup"]
                + F.when(acc["run"] >= 2, acc["run"]).otherwise(F.lit(0))
            ).alias("dup"),
        )

    return F.aggregate(arr, zero, step, fin)


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-doc repetition metrics + keep flag (top-word and top-bigram
    fractions at the Gopher-style 0.2 threshold)."""
    d = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).select(
        "doc_id",
        F.size("w").alias("n"),
        _run_stats(F.array_sort("w")).alias("ws"),
        _run_stats(
            F.array_sort(
                F.when(
                    F.size("w") >= 2,
                    F.expr(
                        "transform(sequence(0, size(w) - 2),"
                        " i -> concat(element_at(w, i + 1), ' ',"
                        " element_at(w, i + 2)))"
                    ),
                ).otherwise(F.expr("cast(array() as array<string>)"))
            )
        ).alias("bs"),
    )
    top_w = F.col("ws")["mx"].cast("double") / F.col("n")
    dup_w = F.col("ws")["dup"].cast("double") / F.col("n")
    top_b = F.when(
        F.col("n") >= 2, F.col("bs")["mx"].cast("double") / (F.col("n") - 1)
    )
    return d.select(
        "doc_id",
        F.col("n").cast("long").alias("n_words"),
        F.round(top_w, 6).alias("top_word_frac"),
        F.round(dup_w, 6).alias("dup_word_frac"),
        F.round(top_b, 6).alias("top_bigram_frac"),
        ((top_w <= 0.2) & (top_b <= 0.2)).alias("keep"),
    )


@register(
    "q122_repetition_filter",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), c AS (
  SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1, 2
), ws AS (
  SELECT doc_id, max(cnt) AS mx, sum(cnt) AS n,
         coalesce(sum(cnt) FILTER (WHERE cnt >= 2), 0) AS dup
  FROM c GROUP BY 1
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i + 1])) AS b
  FROM documents
), bc AS (
  SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2
), bs AS (
  SELECT doc_id, max(cnt) AS bmx FROM bc GROUP BY 1
)
SELECT d.doc_id,
       ws.n::BIGINT AS n_words,
       round(ws.mx::DOUBLE / ws.n, 6) AS top_word_frac,
       round(ws.dup::DOUBLE / ws.n, 6) AS dup_word_frac,
       round(bs.bmx::DOUBLE / (ws.n - 1), 6) AS top_bigram_frac,
       (ws.mx::DOUBLE / ws.n <= 0.2
        AND bs.bmx::DOUBLE / (ws.n - 1) <= 0.2) AS keep
FROM documents d JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id)
""",
    doc=(
        "Gopher-style repetition quality filters: top-word / top-bigram "
        "/ duplicate-word-type fractions with a keep flag. Spark side is "
        "a zero-shuffle sorted-array run-length fold; the oracle proves "
        "it equals the explode+groupBy mode computation."
    ),
)
def q122_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q123: sequence packing (context-window assembly for training)
# --------------------------------------------------------------------------
# Training examples are packed into fixed token budgets ("concat then
# chunk"): documents are concatenated in a deterministic order and cut
# every `budget` tokens; a document belongs to the pack where it STARTS.
# Packing runs INDEPENDENTLY per shard (here `source`) — the window is
# partitioned, never global, so the cumulative sum distributes (the q62
# single-task-window lesson; production shards by file/source exactly
# like this).
PACK_BUDGET = 256


def pack_assignments(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Doc-level pack assignment: every input column plus the token
    count and the pack the doc STARTS in (per-shard partitioned cumsum;
    shared by q123 and the streaming CorpusPrep loop)."""
    tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = docs.select("*", tok.alias("tok")).select(
        "*", F.sum("tok").over(w).alias("cum")
    )
    return c.select(
        *docs.columns,
        "tok",
        F.floor((F.col("cum") - F.col("tok")) / budget)
        .cast("long")
        .alias("pack_id"),
    )


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per (source, pack) roster: doc count, token total, doc-id range."""
    return (
        pack_assignments(docs, budget)
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "q123_sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS tok
  FROM documents
), c AS (
  SELECT doc_id, source, tok,
         sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source, ((cum - tok) // {PACK_BUDGET})::BIGINT AS pack_id,
       count(*) AS n_docs, sum(tok)::BIGINT AS total_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1, 2
""",
    doc=(
        "Sequence packing: per-shard concat-then-chunk assignment of "
        "documents to fixed token budgets (pack = floor(start/budget) "
        "over a PARTITIONED cumulative sum), with per-pack rosters. "
        "One shuffle on the shard key; no global window."
    ),
)
def q123_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q125: BPE pair-frequency vocabulary induction (the first merge step)
# --------------------------------------------------------------------------
# Byte-pair-encoding training starts from per-word symbol sequences and
# repeatedly merges the most frequent adjacent pair. The corpus-scale
# cost is THIS step: word frequencies (one shuffle on the word — the
# distinct-word table is tiny next to the corpus) then adjacent-pair
# counts weighted by word frequency (one shuffle on the pair). Every
# later merge iterates over the DISTINCT-WORD table only, so the corpus
# is scanned once no matter how many merges are learned; the driver
# loop over merges is metadata-sized, exactly how production BPE
# trainers shard the work.
BPE_TOP_K = 20


def bpe_pair_frequencies(docs: DataFrame, top_k: int = BPE_TOP_K) -> DataFrame:
    """Top-k adjacent character pairs across the corpus, weighted by
    word frequency — the argmax set of the first BPE merge."""
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # single-char words contribute no pair; the guard matters because
    # Spark's sequence(1, 0) is DESCENDING ([1, 0]), which would emit
    # junk char+empty pairs that DuckDB's empty range(1, 1) never sees
    pairs = wf.filter(F.length("word") >= 2).select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> concat(substring(word, i, 1), substring(word, i + 1, 1)))"
            )
        ).alias("pair"),
    )
    w = W.orderBy(F.col("pair_count").desc(), F.col("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("pair", "pair_count", F.col("rk").cast("int").alias("rk"))
    )


@register(
    "q125_bpe_pair_frequencies",
    oracle=f"""
WITH wf AS (
  SELECT word, count(*) AS wc FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY word
), p AS (
  SELECT unnest(list_transform(range(1, greatest(len(word), 1)),
                i -> word[i] || word[i + 1])) AS pair, wc
  FROM wf
), pc AS (
  SELECT pair, sum(wc)::BIGINT AS pair_count FROM p GROUP BY pair
)
SELECT pair, pair_count, rk::INT AS rk FROM (
  SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair) AS rk
  FROM pc
) WHERE rk <= {BPE_TOP_K}
""",
    doc=(
        "BPE vocabulary induction, first merge step: corpus-weighted "
        "adjacent character-pair frequencies with a deterministic top-k. "
        "Two linear shuffles (word count, pair count); the top-k window "
        "runs over the pair-count table, never the corpus."
    ),
)
def q125_bpe_pair_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_pair_frequencies(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q126: dedup-aware sampling weights (cluster size -> keep probability)
# --------------------------------------------------------------------------
# Production mixtures do not hard-drop every duplicate: a document that
# appears n times is often kept with probability ~1/n so the EXPECTED
# number of surviving copies is one (soft dedup preserves natural
# up-weighting signals while bounding repetition). This composes the
# exact-dup grouping (q43's shape) with q117's deterministic draw: one
# window over the text-hash partition for the cluster size, then the
# stateless md5 draw against rate/n.
def dedup_aware_sample(docs: DataFrame, rate: float = 0.9) -> DataFrame:
    """Per doc: duplicate-cluster size, weight 1/n, and the kept flag
    from a deterministic hash draw against rate * weight."""
    n = F.count(F.lit(1)).over(W.partitionBy(F.md5("text")))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("dup_count"),
        F.round(F.lit(1.0) / n, 6).alias("weight"),
        (u < F.lit(rate) / n).alias("kept"),
    )


@register(
    "q126_dedup_aware_sample",
    oracle="""
WITH s AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY md5(text)) AS n,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, n::BIGINT AS dup_count, round(1.0 / n, 6) AS weight,
       (u < 0.9 / n) AS kept
FROM s
""",
    doc=(
        "Dedup-aware soft sampling: exact-duplicate cluster size via one "
        "text-hash window, weight 1/n, kept iff the deterministic "
        "md5-of-id draw falls under rate/n — expected one surviving copy "
        "per cluster. One shuffle on the text hash; stateless draw."
    ),
)
def q126_dedup_aware_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_aware_sample(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q127: document chunking with overlap (context-window splitter)
# --------------------------------------------------------------------------
# Retrieval and long-document training both split documents into
# fixed-token chunks with a small overlap so no span is cut without
# context. Pure per-row array slicing + one posexplode — corpus-linear,
# no shuffle, chunk ids deterministic. Stride = chunk - overlap; the
# final partial chunk is kept iff it adds tokens beyond the previous
# chunk's end (standard splitter behavior).
CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_documents(
    docs: DataFrame, chunk: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> DataFrame:
    """One row per (doc_id, chunk_id): token span, token count, and the
    md5 fingerprint of the chunk text."""
    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap
    w = F.split(F.col("text"), " ")
    # chunk count: 1 + ceil(max(n - chunk, 0) / stride)
    d = docs.select("doc_id", w.alias("w")).select(
        "doc_id",
        F.size("w").alias("n_tokens_doc"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, 1 + int(ceil(greatest(size(w) - {chunk}, 0) / {stride})) - 1),"
                f" i -> slice(w, i * {stride} + 1, {chunk}))"
            )
        ).alias("chunk_id", "cw"),
    )
    return d.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (F.col("chunk_id") * stride).cast("long").alias("start_token"),
        F.size("cw").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "cw")).alias("chunk_md5"),
    )


@register(
    "q127_chunk_documents",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), c AS (
  SELECT doc_id,
         unnest(range(0, 1 + ceil(greatest(len(w) - {CHUNK_TOKENS}, 0)
                                  / {CHUNK_TOKENS - CHUNK_OVERLAP})::INT)) AS chunk_id,
         w
  FROM d
)
SELECT doc_id, chunk_id::INT AS chunk_id,
       (chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP})::BIGINT AS start_token,
       len(w[chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 :
             chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS}])::BIGINT
         AS n_tokens,
       md5(array_to_string(w[chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 :
             chunk_id * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS}], ' '))
         AS chunk_md5
FROM c
""",
    doc=(
        "Document chunking with overlap: fixed-token windows at stride "
        "chunk-overlap, one posexplode over per-row array slices — "
        "corpus-linear, no shuffle; chunk fingerprints via md5. The "
        "splitter every retrieval/long-context pipeline runs."
    ),
)
def q127_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q128: the FULL BPE merge loop (q125 is its first step)
# --------------------------------------------------------------------------
# A production tokenizer trainer learns K merges, each = (argmax of the
# corpus-weighted adjacent-pair counts) + (apply that merge to every
# word). The scale shape (the design q125's header sketches): the CORPUS
# is scanned exactly once — into the distinct-word frequency table —
# and every iteration runs over that metadata-sized table only; the
# driver loop collects one scalar (the argmax pair) per merge, exactly
# how production BPE trainers shard the work.
#
# Merge application is true left-to-right non-overlapping BPE ("aaa"
# with merge (a,a) -> [aa, a]), expressed WITHOUT a sequential fold so
# the DuckDB oracle can run the identical computation: pair position i
# is merged iff it matches AND its distance to the previous non-match
# position is odd (within a run of consecutive matches — only possible
# when the pair self-chains — the 1st, 3rd, ... merge; a just-formed
# symbol can never re-merge inside one step since merged == left is
# impossible). Words are short, so the O(len^2) prefix scan inside the
# per-word lambdas is constant-bounded.
BPE_MERGES = 6


def _bpe_pair_counts(syms: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts over the symbol table."""
    return (
        syms.filter(F.size("s") >= 2)
        .select(
            "wc",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " i -> struct(element_at(s, i) AS l,"
                    " element_at(s, i + 1) AS r))"
                )
            ).alias("pr"),
        )
        .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
        .agg(F.sum("wc").alias("cnt"))
    )


def _sql_str(s: str) -> str:
    """Escape a learned symbol for embedding in a Spark SQL string
    literal.  Spark's parser processes backslash escapes inside
    single-quoted literals (unlike DuckDB), so backslashes must be
    doubled FIRST — a corpus token with a trailing backslash would
    otherwise swallow the closing quote and break the expression."""
    return s.replace("\\", "\\\\").replace("'", "''")


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    qa, qb = _sql_str(a), _sql_str(b)
    # every sequence(1, n) is guarded for n = 0: Spark's sequence(1, 0)
    # is DESCENDING ([1, 0]), and element_at rejects index 0
    with_m = syms.withColumn(
        "m",
        F.expr(
            f"CASE WHEN size(s) >= 2 THEN transform(sequence(1, size(s) - 1),"
            f" i -> element_at(s, i) = '{qa}' AND element_at(s, i + 1) = '{qb}')"
            f" ELSE cast(array() AS array<boolean>) END"
        ),
    ).withColumn(
        "sel",
        F.expr(
            "CASE WHEN size(m) >= 1 THEN"
            " transform(sequence(1, size(m)), i -> element_at(m, i) AND"
            " ((i - coalesce(array_max(filter(sequence(1, i),"
            " j -> NOT element_at(m, j))), 0)) % 2 = 1))"
            " ELSE cast(array() AS array<boolean>) END"
        ),
    )
    return with_m.select(
        *[c for c in syms.columns if c != "s"],
        F.expr(
            f"CASE WHEN size(s) >= 1 THEN"
            f" filter(transform(sequence(1, size(s)), i ->"
            f" CASE WHEN i <= size(sel) AND element_at(sel, i) THEN '{qa}{qb}'"
            f"      WHEN i >= 2 AND element_at(sel, i - 1) THEN NULL"
            f"      ELSE element_at(s, i) END), x -> x IS NOT NULL)"
            f" ELSE s END"
        ).alias("s"),
    )


def _bpe_fit(
    docs: DataFrame,
    n_merges: int,
    min_count: int = 1,
    max_words: int | None = None,
):
    """The shared trainer: returns (merges list, final word->symbols
    DataFrame). One corpus scan; each iteration over the distinct-word
    table; one argmax scalar collected per merge.

    100 TB scale bound (VERDICT r7 #6): a web-scale corpus has billions
    of distinct whitespace tokens (URLs, hashes, code identifiers), so
    "the merge loop iterates over the distinct-word table" is only
    metadata-sized if that table is CAPPED. `min_count` drops words
    rarer than the floor (one filter on the already-aggregated table);
    `max_words` keeps the top-M by (count desc, word) — deterministic
    truncation, standard tokenizer-trainer practice (rare words can't
    win an argmax early, and their pair mass is negligible by
    construction). With both unset the fit is exact; with `max_words`
    set the per-iteration table is <= max_words rows regardless of
    corpus size. Both knobs apply BEFORE the checkpoint, so the merge
    loop never touches the dropped tail."""
    word_counts = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    if min_count > 1:
        word_counts = word_counts.filter(F.col("wc") >= min_count)
    if max_words is not None:
        # global top-M: one TakeOrdered pass (no full sort materialized)
        word_counts = word_counts.orderBy(
            F.col("wc").desc(), "word"
        ).limit(max_words)
    syms = (
        word_counts
        .select(
            "word",
            "wc",
            F.expr(
                "CASE WHEN length(word) >= 1 THEN"
                " transform(sequence(1, length(word)), i -> substring(word, i, 1))"
                " ELSE cast(array() AS array<string>) END"
            ).alias("s"),
        )
        .localCheckpoint(eager=True)  # the one corpus scan
    )
    merges = []
    for step in range(1, n_merges + 1):
        best = (
            _bpe_pair_counts(syms)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0].l, best[0].r, best[0].cnt
        merges.append((step, l, r, l + r, int(cnt)))
        # bound lineage: the symbol table is metadata-sized
        syms = _apply_merge(syms, l, r).localCheckpoint(eager=True)
    return merges, syms


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    min_count: int = 1,
    max_words: int | None = None,
) -> DataFrame:
    """Learn `n_merges` BPE merges. Returns one row per merge:
    (step, left, right, merged, pair_count), deterministic tie-break
    (count desc, left, right). The corpus is scanned once; each
    iteration's jobs run over the distinct-word symbol table only, and
    the driver collects exactly one argmax row per merge. min_count /
    max_words bound the symbol table at web-corpus scale (see
    _bpe_fit)."""
    merges, _ = _bpe_fit(docs, n_merges, min_count, max_words)
    return docs.sparkSession.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count long"
    )


def _bpe_apply_all(merges: list[tuple[str, str]]):
    """mapInPandas tokenizer apply: ALL learned merges applied to each
    word in ONE Arrow-batched pass over the distinct-word table —
    sequential semantics bit-identical to chaining _apply_merge (each
    merge: one leftmost-greedy non-overlapping scan, in learned order),
    but the job count is independent of K. At tokenizer scale K is tens
    of thousands of merges; K localCheckpointed Spark passes over a
    billions-row word table (the previous capped path) is a job-count
    problem, one batched Python scan is not. A per-word symbol set
    skips definitely-inapplicable merges, so the common cost is O(K)
    set probes + O(applied * |word|).

    The closure is fully self-contained (no module-global references),
    so cloudpickle ships it by value and the executor side never needs
    this package importable (the external driver runs from a foreign
    cwd)."""

    def apply_all(batches):
        import pandas as pd

        for pdf in batches:
            counts = []
            for w in pdf["word"]:
                s = list(w)
                present = set(s)
                for left, right in merges:
                    if left not in present or right not in present:
                        continue
                    i, n, ns, hit = 0, len(s), [], False
                    while i < n:
                        if i + 1 < n and s[i] == left and s[i + 1] == right:
                            ns.append(left + right)
                            i += 2
                            hit = True
                        else:
                            ns.append(s[i])
                            i += 1
                    if hit:
                        s = ns
                        present = set(s)
                counts.append(len(s))
            yield pd.DataFrame({"word": pdf["word"], "nt": counts})

    return apply_all


def bpe_encode(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    min_count: int = 1,
    max_words: int | None = None,
) -> DataFrame:
    """Tokenize the corpus with the vocabulary bpe_train just learned:
    per doc, word count and BPE token count. The tokenizer runs over
    the DISTINCT-WORD table only (metadata-sized); the corpus-side cost
    is one explode + a broadcast join of word -> token count + one
    groupBy — the train->apply loop every tokenizer pipeline runs.

    When the trainer is capped (min_count/max_words), the ENCODE side
    must still tokenize every word — an inner join against the capped
    table would silently drop out-of-vocabulary words from the token
    counts. So under a cap the learned merges are re-applied to the
    FULL distinct-word table in ONE Arrow-batched mapInPandas pass
    (_bpe_apply_all: sequential per-merge scans inside Python, job
    count independent of K), and that table feeds the broadcast join."""
    merges, syms = _bpe_fit(docs, n_merges, min_count, max_words)
    if min_count > 1 or max_words is not None:
        wtok = (
            docs.select(F.explode(F.split("text", " ")).alias("word"))
            .distinct()
            .mapInPandas(
                _bpe_apply_all([(l, r) for _, l, r, _, _ in merges]),
                "word string, nt long",
            )
        )
    else:
        wtok = syms.select("word", F.size("s").cast("long").alias("nt"))
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .join(F.broadcast(wtok), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").alias("n_tokens"),
        )
    )


def _bpe_oracle(
    n_merges: int = BPE_MERGES,
    encode: bool = False,
    max_words: int | None = None,
) -> str:
    """Unrolled K-step DuckDB mirror of bpe_train / bpe_encode: per
    step, the argmax pair via one window, the merge applied via the
    identical run-parity lambdas (w{k} = symbol table after k merges).
    encode=True emits the per-doc tokenization instead of the merges.
    max_words mirrors the trainer's deterministic top-M truncation
    (ORDER BY wc DESC, word LIMIT M); a capped ENCODE re-applies the
    learned merges to the FULL distinct-word table (f{k} chain), same
    as bpe_encode's OOV-safe path."""
    apply_s = (
        "list_filter(list_transform(range(1, len(s) + 1), i -> "
        "CASE WHEN i <= len(sel) AND sel[i] THEN b.l || b.r "
        "     WHEN i >= 2 AND sel[i - 1] THEN NULL "
        "     ELSE s[i] END), x -> x IS NOT NULL)"
    )
    w0_inner = (
        "  SELECT word, count(*) AS wc,\n"
        "         list_transform(range(1, len(word) + 1), i -> word[i]) AS s\n"
        "  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)\n"
        "  GROUP BY word"
    )
    if max_words is not None:
        w0 = (
            "WITH w0 AS (\n  SELECT word, wc, s FROM (\n"
            + w0_inner.replace("\n", "\n  ")
            + f"\n  )\n  ORDER BY wc DESC, word LIMIT {max_words}\n)"
        )
    else:
        w0 = "WITH w0 AS (\n" + w0_inner + "\n)"
    parts = [w0]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(
            f"p{k} AS (\n"
            f"  SELECT pr.l AS l, pr.r AS r, sum(wc)::BIGINT AS cnt\n"
            f"  FROM (SELECT wc, unnest(list_transform(range(1, len(s)),\n"
            f"          i -> {{'l': s[i], 'r': s[i + 1]}})) AS pr FROM w{p})\n"
            f"  GROUP BY pr.l, pr.r\n"
            f"), b{k} AS (\n"
            f"  SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1\n"
            f"), w{k} AS (\n"
            f"  SELECT word, wc, {apply_s} AS s\n"
            f"  FROM (\n"
            f"    SELECT word, wc, s,\n"
            f"      list_transform(range(1, len(m) + 1), i -> m[i] AND\n"
            f"        ((i - coalesce(list_max(list_filter(range(1, i + 1),\n"
            f"          j -> NOT m[j])), 0)) % 2 = 1)) AS sel, b\n"
            f"    FROM (SELECT word, wc, s, list_transform(range(1, len(s)),\n"
            f"            i -> s[i] = b.l AND s[i + 1] = b.r) AS m, b\n"
            f"          FROM w{p}, b{k} b)\n"
            f"  )\n"
            f")"
        )
    if encode:
        src = f"w{n_merges}"
        if max_words is not None:
            # OOV-safe capped encode: re-apply the learned merges
            # (b1..bK off the CAPPED trainer) to the FULL word table
            parts.append(
                "f0 AS (\n"
                "  SELECT word, list_transform(range(1, len(word) + 1),"
                " i -> word[i]) AS s\n"
                "  FROM (SELECT DISTINCT unnest(string_split(text, ' '))"
                " AS word FROM documents)\n)"
            )
            for k in range(1, n_merges + 1):
                p = k - 1
                parts.append(
                    f"f{k} AS (\n"
                    f"  SELECT word, {apply_s} AS s\n"
                    f"  FROM (\n"
                    f"    SELECT word, s,\n"
                    f"      list_transform(range(1, len(m) + 1), i -> m[i] AND\n"
                    f"        ((i - coalesce(list_max(list_filter(range(1, i + 1),\n"
                    f"          j -> NOT m[j])), 0)) % 2 = 1)) AS sel, b\n"
                    f"    FROM (SELECT word, s, list_transform(range(1, len(s)),\n"
                    f"            i -> s[i] = b.l AND s[i + 1] = b.r) AS m, b\n"
                    f"          FROM f{p}, b{k} b)\n"
                    f"  )\n"
                    f")"
                )
            src = f"f{n_merges}"
        return (
            ",\n".join(parts)
            + f""",
wtok AS (SELECT word, len(s)::BIGINT AS nt FROM {src})
SELECT doc_id, count(*)::BIGINT AS n_words, sum(nt)::BIGINT AS n_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
JOIN wtok USING (word)
GROUP BY doc_id"""
        )
    unions = "\n  UNION ALL\n".join(
        f"  SELECT {k} AS step, l AS \"left\", r AS \"right\","
        f" l || r AS merged, cnt AS pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT step::INT AS step, \"left\", \"right\", merged, pair_count\nFROM (\n{unions}\n)\nORDER BY step"
    )


@register(
    "q128_bpe_train",
    oracle=_bpe_oracle(),
    doc=(
        "Full BPE tokenizer training loop: K merges, each an argmax of "
        "corpus-weighted adjacent-pair counts followed by left-to-right "
        "non-overlapping merge application. Corpus scanned once into the "
        "distinct-word table; every iteration is metadata-sized; the "
        "driver collects one scalar per merge — the production trainer "
        "shape (extends q125, which is this loop's first step)."
    ),
)
def q128_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train(_docs(spark, sf_dir))


@register(
    "q129_bpe_encode",
    oracle=_bpe_oracle(encode=True),
    doc=(
        "BPE tokenization with the just-learned vocabulary: per doc, "
        "word count and token count after K merges. The tokenizer runs "
        "over the distinct-word table only; corpus cost is one explode "
        "+ a broadcast word->token-count join + one groupBy — the "
        "train->apply loop every tokenizer pipeline runs (companion to "
        "q128)."
    ),
)
def q129_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_encode(_docs(spark, sf_dir))


# The scale-bounded trainer (VERDICT r7 #6): cap the distinct-word
# table at top-M by (count desc, word) before the merge loop. M=16
# genuinely truncates the fixture vocabulary (31 distinct words), so
# the oracle check proves cap semantics, not just the uncapped path
# re-labelled. At 100 TB this knob is what keeps each merge iteration
# metadata-sized under billions of distinct web tokens.
BPE_CAP_WORDS = 16


@register(
    "q130_bpe_train_capped",
    oracle=_bpe_oracle(max_words=BPE_CAP_WORDS),
    doc=(
        "BPE training over a top-M-capped word table (deterministic "
        "count-desc/word truncation — the standard web-scale trainer "
        "bound). Same K-merge argmax/apply loop as q128; the cap is one "
        "TakeOrdered pass before the checkpoint, so every iteration is "
        "<= max_words rows regardless of corpus size."
    ),
)
def q130_bpe_train_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train(_docs(spark, sf_dir), max_words=BPE_CAP_WORDS)


@register(
    "q131_bpe_encode_capped",
    oracle=_bpe_oracle(encode=True, max_words=BPE_CAP_WORDS),
    doc=(
        "OOV-safe tokenization with a cap-trained vocabulary: merges "
        "learned on the top-M word table, then RE-APPLIED to the full "
        "distinct-word table so out-of-vocabulary words still tokenize "
        "(an inner join against the capped table would silently drop "
        "them). Companion to q130; corpus cost unchanged from q129."
    ),
)
def q131_bpe_encode_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_encode(_docs(spark, sf_dir), max_words=BPE_CAP_WORDS)


# --------------------------------------------------------------------------
# q132: BM25 top-k lexical retrieval (the classic relevance scorer)
# --------------------------------------------------------------------------
# The per-(doc, term) contribution is ONE shared SQL template evaluated
# by both engines, so every float op parses with identical precedence
# and runs on identical IEEE doubles; the per-doc sum folds the
# contributions in SORTED TERM ORDER on both sides (float addition is
# not associative — an unpinned SUM() would hash-mismatch whenever the
# engines group in different orders); and the score is rounded to 6
# decimals on both sides (the q56 pattern) because ln() is the one op
# with no bit-portable form — JVM Math.log and DuckDB's libm disagree
# by 1-3 ulps on some inputs (measured on this fixture's idf values),
# and +,-,*,/ are correctly rounded everywhere but ln is only
# faithfully rounded. The final ordering uses the ROUNDED score with a
# doc_id tiebreak so the top-k row set is engine-independent.
# Lucene-style idf: ln(1 + (N - df + 0.5)/(df + 0.5)); k1=1.2, b=0.75.
_BM25_CONTRIB = (
    "ln(1e0 + (n_docs - df + 0.5) / (df + 0.5))"
    " * ((tf * 2.2) / (tf + 1.2 *"
    " (0.25 + (0.75 * dl) / (cast(total_len as double) / n_docs))))"
)


@register(
    "q132_bm25_topk",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(len(w))::BIGINT AS total_len FROM d),
tok AS (SELECT doc_id, len(w)::BIGINT AS dl, unnest(w) AS t FROM d),
tf AS (
  SELECT doc_id, dl, t, count(*)::BIGINT AS tf FROM tok
  WHERE t IN ({", ".join(f"'{w}'" for w in sorted(set(_QUERY_TEXT.split(' '))))})
  GROUP BY doc_id, dl, t
),
dft AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY t),
contrib AS (
  SELECT doc_id, t, {_BM25_CONTRIB} AS c
  FROM tf JOIN dft USING (t) CROSS JOIN stats
),
scored AS (
  SELECT doc_id, count(*)::BIGINT AS n_matched,
         round(list_reduce(list(c ORDER BY t), (a, b) -> a + b), 6) AS bm25
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, n_matched, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 25
""",
    doc=(
        "BM25 top-k retrieval against a fixed query (k1=1.2, b=0.75, "
        "Lucene idf). Scale shape: one corpus scan builds query-term "
        "tfs; df and the corpus stats are tiny broadcast frames; the "
        "per-doc score is a sorted-order array fold (bit-deterministic "
        "under any partitioning); TakeOrdered top-k, no global sort."
    ),
)
def q132_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _words(_docs(spark, sf_dir))
    qterms = sorted(set(_QUERY_TEXT.split(" ")))
    qlit = ", ".join(f"'{w}'" for w in qterms)
    stats = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("w")).cast("long").alias("total_len"),
    )
    tf = (
        d.select(
            "doc_id",
            F.size("w").cast("long").alias("dl"),
            F.explode("w").alias("t"),
        )
        .filter(F.expr(f"t IN ({qlit})"))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    contrib = (
        tf.join(F.broadcast(dft), "t")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "t", F.expr(_BM25_CONTRIB).alias("c"))
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.expr(
                "round(aggregate(sort_array(collect_list(struct(t, c))),"
                " cast(0 as double), (acc, x) -> acc + x.c), 6)"
            ).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(25)
    )


# --------------------------------------------------------------------------
# q133: corpus length-distribution report (exact percentiles at scale)
# --------------------------------------------------------------------------
@register(
    "q133_length_distribution",
    oracle="""
WITH lens AS (
  SELECT lang, source, len(string_split(text, ' '))::BIGINT AS dl FROM documents
),
hist AS (
  SELECT lang, source, dl, count(*)::BIGINT AS cnt FROM lens
  GROUP BY lang, source, dl
),
cum AS (
  SELECT lang, source, dl, cnt,
         sum(cnt) OVER (PARTITION BY lang, source ORDER BY dl)::BIGINT AS cf
  FROM hist
),
tot AS (
  SELECT lang, source, sum(cnt)::BIGINT AS n_docs,
         sum(dl * cnt)::BIGINT AS total_tokens,
         min(dl) AS min_len, max(dl) AS max_len
  FROM hist GROUP BY lang, source
)
SELECT c.lang, c.source, any_value(n_docs) AS n_docs,
       any_value(total_tokens) AS total_tokens,
       any_value(min_len) AS min_len,
       min(CASE WHEN cf >= (n_docs + 1) // 2 THEN dl END) AS p50_len,
       min(CASE WHEN cf >= (9 * n_docs + 9) // 10 THEN dl END) AS p90_len,
       min(CASE WHEN cf >= (99 * n_docs + 99) // 100 THEN dl END) AS p99_len,
       any_value(max_len) AS max_len
FROM cum c JOIN tot USING (lang, source)
GROUP BY c.lang, c.source
""",
    doc=(
        "Per-(lang, source) token-length distribution: n_docs, totals, "
        "min/max and EXACT discrete p50/p90/p99 — computed from the "
        "length histogram + a cumulative sum, never by sorting a "
        "group's rows (a language's documents are billions of rows at "
        "corpus scale; the histogram is bounded by distinct lengths). "
        "Percentile index ceil(p*n) is pure integer arithmetic "
        "((k*n + k-?) // m form), so cross-engine parity is exact. "
        "The report every packing/config stage runs first."
    ),
)
def q133_length_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "lang", "source", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    hist = d.groupBy("lang", "source", "dl").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cum = hist.withColumn(
        "cf",
        F.sum("cnt").over(
            W.partitionBy("lang", "source").orderBy("dl")
        ).cast("long"),
    )
    tot = hist.groupBy("lang", "source").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum(F.col("dl") * F.col("cnt")).cast("long").alias("total_tokens"),
        F.min("dl").alias("min_len"),
        F.max("dl").alias("max_len"),
    )
    j = cum.join(F.broadcast(tot), ["lang", "source"])
    pick = lambda idx: F.min(F.when(F.col("cf") >= F.expr(idx), F.col("dl")))
    return j.groupBy("lang", "source").agg(
        F.first("n_docs").alias("n_docs"),
        F.first("total_tokens").alias("total_tokens"),
        F.first("min_len").alias("min_len"),
        pick("(n_docs + 1) div 2").alias("p50_len"),
        pick("(9 * n_docs + 9) div 10").alias("p90_len"),
        pick("(99 * n_docs + 99) div 100").alias("p99_len"),
        F.first("max_len").alias("max_len"),
    )
