"""Round-6 scale operators: hot-bucket-capped LSH (the skew guard),
incremental batch-vs-corpus dedup, and product-quantization ADC ANN.

These are the knobs that keep the dedup/ANN family linear at 100 TB:
q112's cap bounds the band self-join under exact-duplicate skew, q113
is the continuous-ingestion shape (batch joins the standing corpus's
band index), q114 compresses the scanned corpus 64x via PQ codes.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from emap_spark.plans.similarity import K_CODES, M_SUB, pq_adc_topk, pq_codes
from emap_spark.plans.text_dedup import (
    lsh_candidate_pairs,
    lsh_candidate_pairs_capped,
    lsh_incremental_matches,
)


_SH = (
    "array_distinct(transform(sequence(1, size(w)-2),"
    " i -> concat_ws(' ', w[i-1], w[i], w[i+1])))"
)


def _shingles_of(docs):
    w = docs.withColumn("w", F.split("text", " "))
    return w.select("doc_id", F.explode(F.expr(_SH)).alias("s"))


def _shingle_sets_of(docs):
    w = docs.withColumn("w", F.split("text", " "))
    return w.select("doc_id", F.expr(_SH).alias("sh"))


def _skewed_corpus(spark, n_hot=40, n_pairs=4, words_per_doc=60):
    """A corpus with one exact-duplicate mass (n_hot identical docs —
    the degenerate LSH bucket) plus planted near-dup PAIRS of unique
    docs (the signal the capped join must still find)."""
    rng = random.Random(13)
    vocab = [f"w{k}" for k in range(400)]
    boiler = " ".join(vocab[k % 37] for k in range(words_per_doc))
    rows = [(i, boiler) for i in range(n_hot)]  # the hot bucket
    for p in range(n_pairs):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(words_per_doc)]
        rows.append((100 + p, " ".join(words)))
        mutated = list(words)
        mutated[30] = "MUTANT"
        rows.append((200 + p, " ".join(mutated)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_bounds_skew_but_keeps_signal(spark):
    docs = _skewed_corpus(spark)
    sh = _shingles_of(docs)
    uncapped = lsh_candidate_pairs(sh, 8, 2)
    capped = lsh_candidate_pairs_capped(sh, 8, 2, max_bucket=4)

    n_un = uncapped.count()
    # the identical mass alone contributes 40*39/2 = 780 pairs uncapped
    assert n_un >= 780

    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # no pair from the hot bucket survives the cap ...
    assert not any(a < 100 and b < 100 for a, b in got)
    # ... but every planted near-dup pair (bucket width 2) does
    assert {(100 + p, 200 + p) for p in range(4)} <= got


def test_incremental_matches_find_planted_corpus_dups(spark):
    rng = random.Random(29)
    vocab = [f"w{k}" for k in range(400)]
    corpus_rows, batch_rows = [], []
    for i in range(12):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(70)]
        corpus_rows.append((i, " ".join(words)))
        if i < 5:  # five incoming docs are near-dups of corpus docs
            mutated = list(words)
            mutated[10] = "MUTANT"
            batch_rows.append((1000 + i, " ".join(mutated)))
    # one genuinely novel incoming doc
    batch_rows.append((2000, " ".join(vocab[k % 399] for k in range(70))))
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    out = lsh_incremental_matches(
        _shingles_of(batch), _shingles_of(corpus),
        _shingle_sets_of(batch), _shingle_sets_of(corpus),
        n_hashes=128, n_bands=16, threshold=0.5,
    )
    rows = {r.doc_id: r.dup_of for r in out.collect()}
    assert rows == {1000 + i: i for i in range(5)}  # novel doc absent


def test_pq_codes_shape_and_seed_self_encoding(spark):
    rng = random.Random(41)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = pq_codes(emb, K_CODES).collect()
    assert len(codes) == 60
    by_id = {r.vec_id: r.codes for r in codes}
    assert all(len(c) == M_SUB for c in by_id.values())
    # a seed vector's sub-slices are distance-0 from their own codebook
    # entry, so every seed encodes to its own code in every subspace
    for i in range(K_CODES):
        assert by_id[i] == [i] * M_SUB


def test_pq_adc_ranks_exact_duplicate_first(spark):
    rng = random.Random(43)
    q = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(0, q), (777, list(q))] + [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(1, 50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = pq_adc_topk(emb, n_queries=1, k=K_CODES, top_k=3).collect()
    # the exact duplicate shares all codes with the query, so its ADC
    # distance is the query's own quantization error — the minimum
    assert top[0].query_id == 0 and top[0].neighbor_id == 777


def test_ivf_pq_prunes_to_probed_cells_and_ranks_duplicate_first(spark):
    """q115: candidates come ONLY from the query's probed cells
    (partition pruning — the IVF half), and an exact duplicate shares
    the query's cell AND residual codes, so its ADC distance is the
    query's own quantization error — the minimum (the PQ half)."""
    from emap_spark.plans.similarity import ivf_assignments, ivf_pq_topk

    rng = random.Random(53)
    q = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(0, q), (777, list(q))] + [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(1, 60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = ivf_pq_topk(emb, n_queries=1, kc=4, n_probes=2, k=K_CODES, top_k=5)
    got = top.collect()
    assert got[0].query_id == 0 and got[0].neighbor_id == 777
    # every returned neighbor sits in one of the query's 2 probed cells
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("ce")
    )
    assign = {r.vec_id: r.cluster for r in ivf_assignments(emb, cents).collect()}
    probed = {r.cluster for r in got}
    assert len(probed) <= 2
    assert all(assign[r.neighbor_id] in probed for r in got)


def test_pq_refine_reduces_quantization_error(spark):
    from pyspark.sql import functions as F

    from emap_spark.plans.similarity import (
        pq_assignments,
        pq_refine,
        pq_seed_codebook,
        _subspace_rows,
        _d2,
    )

    rng = random.Random(47)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sub = _subspace_rows(emb, "vec_id", "embedding", "sv")

    def total_err(cb):
        a = pq_assignments(sub, cb)
        return a.agg(F.sum(_d2("sv", "cv"))).collect()[0][0]

    seeds = pq_seed_codebook(emb, K_CODES)
    e0 = total_err(seeds)
    refined = pq_refine(emb, seeds, iters=1)
    e1 = total_err(refined)
    assert e1 <= e0 + 1e-9  # Lloyd step never increases the error
    assert e1 < e0 * 0.95   # and on random data it strictly improves


def test_bucket_cap_plan_is_join_free(spark, sf_dir):
    """The cap buys the one-pass plan: pairs generate bucket-locally
    from the grouped member array — no self-join, so no second band
    subtree and no join exchange in the physical plan."""
    from emap_spark.registry import queries

    df = queries()["q112_lsh_bucket_cap"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_incremental_dedup_bucketed_corpus_never_reshuffles(spark, sf_dir):
    """q113's 100 TB claim, pinned against the physical plan: with the
    standing corpus's band index persisted BUCKETED BY bkey, the
    batch-vs-corpus candidate join shuffles ONLY the incoming batch —
    the corpus side reads its buckets in place."""
    import uuid

    from emap_spark.plans.text_dedup import lsh_band_keys, minhash_signatures
    from emap_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    w = d.withColumn("w", F.split("text", " "))
    sh = w.select("doc_id", F.explode(F.expr(_SH)).alias("s"))
    bands = lsh_band_keys(minhash_signatures(sh, 8), 8, 2)

    tag = uuid.uuid4().hex[:8]
    t_index = f"corpus_band_index_{tag}"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bands.filter(F.col("doc_id") % 10 != 5).write.bucketBy(8, "bkey").sortBy(
            "bkey"
        ).mode("overwrite").saveAsTable(t_index)

        batch = bands.filter(F.col("doc_id") % 10 == 5).withColumnRenamed(
            "doc_id", "batch_doc"
        )
        corpus = spark.table(t_index).withColumnRenamed("doc_id", "dup_of")
        cand = batch.join(corpus, "bkey")
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan  # corpus read in place
        # exactly the batch side shuffles on bkey (signature groupBy
        # shuffles on doc_id upstream; bkey exchanges must number ONE)
        assert plan.count("Exchange hashpartitioning(bkey") == 1, plan
        assert cand.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t_index}")


def test_corpus_dedup_streaming_loop(spark):
    """CorpusDedup: the continuous-ingestion loop — batch 0 seeds the
    index, a batch-1 near-dup of a batch-0 doc is flagged and NOT
    admitted, a batch-2 near-dup of a batch-1 SURVIVOR is flagged
    (the index grew), novel docs admit; and the candidate join reads
    the corpus buckets in place (only the batch side shuffles)."""
    import uuid

    from emap_spark.streaming.dedup import CorpusDedup

    rng = random.Random(61)
    vocab = [f"w{k}" for k in range(400)]

    def doc(i):
        return (i, " ".join(vocab[rng.randrange(len(vocab))] for _ in range(60)))

    def mutate(d, new_id):
        words = d[1].split(" ")
        words[30] = "MUTANT"
        return (new_id, " ".join(words))

    base = [doc(i) for i in range(6)]
    fresh1, fresh2 = doc(100), doc(200)
    # production width: 1-word mutations sit at Jaccard ~0.9, where the
    # toy 2x4 banding has only ~88% recall — 16x8 bands catch them
    dd = CorpusDedup(
        spark, f"cdx_{uuid.uuid4().hex[:8]}", n_hashes=128, n_bands=16,
        threshold=0.5,
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        d0 = {r.doc_id: r for r in dd.process_batch(
            spark.createDataFrame(base, "doc_id long, text string"), 0
        ).collect()}
        assert all(r.admitted for r in d0.values()) and len(d0) == 6

        b1 = [mutate(base[2], 1002), fresh1]
        d1 = {r.doc_id: r for r in dd.process_batch(
            spark.createDataFrame(b1, "doc_id long, text string"), 1
        ).collect()}
        assert d1[1002].dup_of == 2 and not d1[1002].admitted
        assert d1[100].admitted

        # near-dup of batch-1's SURVIVOR: only findable if the index grew
        b2 = [mutate(fresh1, 2100), fresh2]
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch2 = spark.createDataFrame(b2, "doc_id long, text string")
        d2df = dd.process_batch(batch2, 2)
        d2 = {r.doc_id: r for r in d2df.collect()}
        assert d2[2100].dup_of == 100 and not d2[2100].admitted
        assert d2[200].admitted
        # rejected docs never entered the index
        ids = {r.doc_id for r in spark.table(dd.sets_table).collect()}
        assert ids == {0, 1, 2, 3, 4, 5, 100, 200}

        # at-least-once REPLAY of batch 2 (crash after the index append):
        # the already-indexed survivor re-admits idempotently instead of
        # LSH-matching its own prior index entry, the rejected doc
        # re-scores to the same decision, and the index does not grow
        d2r = {r.doc_id: r for r in dd.process_batch(batch2, 2).collect()}
        assert d2r[200].admitted and d2r[200].dup_of is None
        assert d2r[2100].dup_of == 100 and not d2r[2100].admitted
        rows = spark.table(dd.sets_table).collect()
        assert len(rows) == 8  # no duplicate index rows for doc 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        dd.drop()


def test_corpus_dedup_first_batch_crash_window_recovers(spark):
    """Crash between the two index writes on the FIRST batch: bands is
    written before sets (the replay guard keys on the LAST-written
    sets_table), so a replay that finds bands-but-no-sets takes the
    all-admit path instead of raising TABLE_OR_VIEW_NOT_FOUND, appends
    the missing sets rows exactly once, and the index is fully usable
    afterwards."""
    import uuid

    from emap_spark.streaming.dedup import CorpusDedup

    rng = random.Random(67)
    vocab = [f"w{k}" for k in range(400)]

    def doc(i):
        return (i, " ".join(vocab[rng.randrange(len(vocab))] for _ in range(60)))

    base = [doc(i) for i in range(4)]
    dd = CorpusDedup(
        spark, f"cdc_{uuid.uuid4().hex[:8]}", n_hashes=128, n_bands=16,
        threshold=0.5,
    )
    try:
        b0 = spark.createDataFrame(base, "doc_id long, text string")
        dd.process_batch(b0, 0)
        # simulate the crash window: bands persisted, sets not yet
        spark.sql(f"DROP TABLE {dd.sets_table}")
        d0r = {r.doc_id: r for r in dd.process_batch(b0, 0).collect()}
        assert all(r.admitted for r in d0r.values()) and len(d0r) == 4
        # sets rows landed exactly once despite the replay
        assert spark.table(dd.sets_table).count() == 4

        # the recovered index still catches a batch-1 near-dup
        words = base[1][1].split(" ")
        words[30] = "MUTANT"
        b1 = spark.createDataFrame(
            [(1001, " ".join(words)), doc(100)], "doc_id long, text string"
        )
        d1 = {r.doc_id: r for r in dd.process_batch(b1, 1).collect()}
        assert d1[1001].dup_of == 1 and not d1[1001].admitted
        assert d1[100].admitted
    finally:
        dd.drop()


def test_corpus_dedup_later_batch_crash_window_keeps_bands(spark):
    """Crash between the two index writes on a LATER batch (bands
    appended, sets not): the replay guard — keyed on sets_table, the
    last-written table — does NOT treat those docs as indexed, so they
    re-score to the identical decisions (their half-written band rows
    cannot self-match: verification joins corpus sets on dup_of), their
    sets land exactly once, and — the regression this test pins — their
    bands are PRESENT afterwards, so a future near-dup of a
    crash-window survivor is still rejected. A sets-first write order
    fails this: the guard would re-admit the docs without ever indexing
    their bands."""
    import uuid

    from emap_spark.streaming.dedup import CorpusDedup

    rng = random.Random(73)
    vocab = [f"w{k}" for k in range(400)]

    def doc(i):
        return (i, " ".join(vocab[rng.randrange(len(vocab))] for _ in range(60)))

    def mutate(d, new_id):
        words = d[1].split(" ")
        words[30] = "MUTANT"
        return (new_id, " ".join(words))

    base = [doc(i) for i in range(4)]
    fresh = doc(100)
    dd = CorpusDedup(
        spark, f"cdl_{uuid.uuid4().hex[:8]}", n_hashes=128, n_bands=16,
        threshold=0.5,
    )
    try:
        dd.process_batch(
            spark.createDataFrame(base, "doc_id long, text string"), 0
        )
        snapshot = spark.table(dd.sets_table).collect()

        # batch 1: one near-dup of a batch-0 doc (rejected), one fresh
        b1 = spark.createDataFrame(
            [mutate(base[2], 1002), fresh], "doc_id long, text string"
        )
        d1 = {r.doc_id: r for r in dd.process_batch(b1, 1).collect()}
        assert not d1[1002].admitted and d1[100].admitted

        # simulate the crash window: batch-1 bands appended, batch-1
        # sets not — restore sets_table to its pre-batch-1 snapshot
        spark.sql(f"DROP TABLE {dd.sets_table}")
        (
            spark.createDataFrame(snapshot)
            .write.bucketBy(dd.n_buckets, "doc_id").sortBy("doc_id")
            .mode("overwrite").format("parquet").saveAsTable(dd.sets_table)
        )

        # replay batch 1: identical decisions, sets appended once
        d1r = {r.doc_id: r for r in dd.process_batch(b1, 1).collect()}
        assert not d1r[1002].admitted and d1r[1002].dup_of == d1[1002].dup_of
        assert d1r[100].admitted and d1r[100].dup_of is None
        ids = [r.doc_id for r in spark.table(dd.sets_table).collect()]
        assert sorted(ids) == [0, 1, 2, 3, 100]

        # THE regression: a near-dup of the crash-window survivor must
        # still be rejected — its bands survived the crash+replay
        b2 = spark.createDataFrame(
            [mutate(fresh, 2100)], "doc_id long, text string"
        )
        d2 = {r.doc_id: r for r in dd.process_batch(b2, 2).collect()}
        assert d2[2100].dup_of == 100 and not d2[2100].admitted
    finally:
        dd.drop()


def test_vector_index_build_append_query_with_partition_pruning(spark, tmp_path):
    """VectorIndex: an appended near-duplicate of the query is found via
    the durable index, and the codes scan prunes to the probed cells'
    PARTITIONS (static PartitionFilters — the physical form of q115's
    'cluster = partition column at scale' claim)."""
    from emap_spark.operators.vector_index import VectorIndex

    rng = random.Random(71)

    def blob(center, n, start_id):
        return [
            (start_id + j, [center + rng.uniform(-0.4, 0.4) for _ in range(64)])
            for j in range(n)
        ]

    base = blob(0.0, 20, 0) + blob(4.0, 20, 100) + blob(-4.0, 20, 200)
    emb = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    idx = VectorIndex(spark, str(tmp_path / "vidx"), kc=3, k=K_CODES)
    idx.build(emb)

    # append a batch containing an exact copy of the query vector
    qvec = base[5][1]
    extra = [(900, list(qvec)), *blob(4.0, 5, 300)]
    idx.add_batch(
        spark.createDataFrame(extra, "vec_id long, embedding array<double>")
    )

    q = spark.createDataFrame(
        [(5, qvec)], "query_id long, qe array<double>"
    )
    out = idx.query(q, n_probes=2, top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the codes scan carries the probe clusters as PARTITION filters
    assert "PartitionFilters" in plan and "cluster" in plan
    got = out.collect()
    # the appended exact duplicate shares cell + codes -> minimum ADC
    assert got[0].neighbor_id == 900
    # every neighbor came from a probed cell (<= n_probes distinct)
    assert len({r.cluster for r in got}) <= 2


def test_vector_index_matches_ivf_pq_plan_exactly(spark, tmp_path):
    """The durable index path (build -> query) returns bit-identical
    results to the q115 in-plan operator on the same corpus: same
    quantizers, same ADC fold, same tie-breaks."""
    from emap_spark.operators.vector_index import VectorIndex
    from emap_spark.plans.similarity import ivf_pq_topk

    rng = random.Random(79)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    expect = sorted(
        (r.query_id, r.neighbor_id, r.cluster, r.adc_d2)
        for r in ivf_pq_topk(
            emb, n_queries=3, kc=8, n_probes=2, k=K_CODES, top_k=10
        ).collect()
    )
    idx = VectorIndex(spark, str(tmp_path / "vidx_eq"), kc=8, k=K_CODES)
    idx.build(emb)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.cluster, r.adc_d2)
        for r in idx.query(q, n_probes=2, top_k=10).collect()
    )
    assert got == expect


def test_corpus_prep_end_to_end_loop(spark):
    """CorpusPrep: the composed training-data ingestion loop — planted
    boilerplate is rejected BEFORE dedup (outcome rejected_quality and
    absent from the index), PII survives only redacted in the stored
    corpus, a cross-batch near-dup is rejected against the standing
    index, and admitted docs carry budget-consistent pack assignments."""
    import uuid

    from emap_spark.streaming.corpus_prep import CorpusPrep

    rng = random.Random(83)
    vocab = [f"w{k}" for k in range(400)]

    def words(n):
        return [vocab[rng.randrange(len(vocab))] for _ in range(n)]

    base = words(80)
    pii_words = words(80)
    pii_words[10] = "alice@example.com"
    near = list(base)
    near[40] = "MUTANT"
    docs0 = [
        (1, " ".join(base), "src0"),
        (2, " ".join(pii_words), "src0"),
        (3, "spam " * 59 + "ham", "src1"),  # top_word_frac ~0.98
    ]
    docs1 = [
        (10, " ".join(near), "src0"),  # near-dup of admitted doc 1
        (11, " ".join(words(80)), "src1"),
    ]
    cp = CorpusPrep(
        spark, f"cpx_{uuid.uuid4().hex[:8]}", budget=64,
        n_hashes=128, n_bands=16, threshold=0.5,
    )
    try:
        out0 = {r.doc_id: r for r in cp.process_batch(
            spark.createDataFrame(docs0, "doc_id long, text string, source string"), 0
        ).collect()}
        assert out0[3].outcome == "rejected_quality"
        assert out0[1].outcome == out0[2].outcome == "admitted"

        out1 = {r.doc_id: r for r in cp.process_batch(
            spark.createDataFrame(docs1, "doc_id long, text string, source string"), 1
        ).collect()}
        assert out1[10].outcome == "rejected_dup" and out1[10].dup_of == 1
        assert out1[11].outcome == "admitted"

        corpus = {r.doc_id: r for r in spark.table(cp.corpus_table).collect()}
        assert set(corpus) == {1, 2, 11}
        # the stored text is REDACTED (and dedup ran on the redacted form)
        assert "<EMAIL>" in corpus[2].text
        assert "alice@example.com" not in corpus[2].text
        # rejected docs never entered the dedup index
        idx = {r.doc_id for r in spark.table(cp.dedup.sets_table).collect()}
        assert idx == {1, 2, 11}
        # pack assignment: 80-token docs at budget 64 -> doc 1 starts
        # pack 0, doc 2 starts pack 1 (cum 80), per-shard restart for 11
        assert (corpus[1].pack_id, corpus[1].batch_id) == (0, 0)
        assert corpus[2].pack_id == 1
        assert (corpus[11].pack_id, corpus[11].batch_id) == (0, 1)

        # at-least-once REPLAY of batch 1 (crash after the corpus
        # append, before the streaming commit): the re-admitted doc must
        # NOT double-append — the batch_id partition is dynamically
        # OVERWRITTEN, so the corpus is byte-identical after the replay
        out1r = {r.doc_id: r for r in cp.process_batch(
            spark.createDataFrame(docs1, "doc_id long, text string, source string"), 1
        ).collect()}
        assert out1r[10].outcome == "rejected_dup" and out1r[10].dup_of == 1
        assert out1r[11].outcome == "admitted"
        rows = spark.table(cp.corpus_table).collect()
        assert sorted(r.doc_id for r in rows) == [1, 2, 11]
        replayed = {r.doc_id: r for r in rows}
        assert (replayed[11].pack_id, replayed[11].batch_id) == (0, 1)
    finally:
        cp.drop()


def test_corpus_prep_decontamination_stage(spark):
    """CorpusPrep with a benchmark set: a doc sharing a verbatim 8-gram
    run with the held-out set is rejected BEFORE dedup (outcome
    rejected_contaminated, absent from index and corpus); clean docs
    flow through; the check runs on redacted text on BOTH sides so a
    PII span inside the shared run still matches."""
    import uuid

    from emap_spark.streaming.corpus_prep import CorpusPrep

    rng = random.Random(89)
    vocab = [f"w{k}" for k in range(400)]

    def words(n):
        return [vocab[rng.randrange(len(vocab))] for _ in range(n)]

    bench_words = words(30)
    # the shared run contains an email: redaction must normalize both
    # sides identically for the gram to match
    bench_words[12] = "bob@example.org"
    bench = spark.createDataFrame(
        [(9000, " ".join(bench_words))], "doc_id long, text string"
    )

    dirty = words(60)
    dirty[20:35] = bench_words[5:20]  # 15-word verbatim benchmark run
    docs0 = [
        (1, " ".join(dirty), "src0"),
        (2, " ".join(words(60)), "src0"),
    ]
    cp = CorpusPrep(
        spark, f"cpd_{uuid.uuid4().hex[:8]}",
        benchmark_docs=bench,
        n_hashes=128, n_bands=16, threshold=0.5,
    )
    try:
        out = {r.doc_id: r for r in cp.process_batch(
            spark.createDataFrame(docs0, "doc_id long, text string, source string"), 0
        ).collect()}
        assert out[1].outcome == "rejected_contaminated"
        assert out[2].outcome == "admitted"
        assert {r.doc_id for r in spark.table(cp.corpus_table).collect()} == {2}
        assert {r.doc_id for r in spark.table(cp.dedup.sets_table).collect()} == {2}

        # batch 1: still-clean doc admitted; another contaminated doc
        # caught against the SAME pinned gram set
        dirty2 = words(60)
        dirty2[0:12] = bench_words[10:22]
        out1 = {r.doc_id: r for r in cp.process_batch(
            spark.createDataFrame(
                [(10, " ".join(dirty2), "src1"), (11, " ".join(words(60)), "src1")],
                "doc_id long, text string, source string"), 1
        ).collect()}
        assert out1[10].outcome == "rejected_contaminated"
        assert out1[11].outcome == "admitted"
    finally:
        cp.drop()
