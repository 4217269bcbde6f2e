"""Production-width parameterized dedup/ANN operators (VERDICT round-1
item 9): the oracle queries run toy widths; these tests exercise the
128-hash/16-band MinHash-LSH, 32-bit SimHash, and multi-probe ANN paths
at realistic parameters on planted-near-dup corpora."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from emap_spark.plans.similarity import sign_lsh_ann
from emap_spark.plans.text_dedup import (
    PROD_BANDS,
    PROD_MINHASH,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    verify_candidates,
)


def _corpus(spark, n_base=30, words_per_doc=80):
    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(500)]
    rows = []
    for i in range(n_base):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(words_per_doc)]
        rows.append((i, " ".join(words)))
        if i < 8:  # plant a near-dup: same text, one word changed
            mutated = list(words)
            mutated[40] = "MUTANT"
            rows.append((1000 + i, " ".join(mutated)))
    return spark.createDataFrame(rows, "doc_id long, text string")


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


def test_prod_width_lsh_recall_and_precision(spark):
    docs = _corpus(spark)
    sig = minhash_signatures(_shingles_of(docs), PROD_MINHASH)
    assert len(sig.columns) == 1 + PROD_MINHASH

    cands = lsh_candidate_pairs(_shingles_of(docs), PROD_MINHASH, PROD_BANDS)
    verified = verify_candidates(_shingle_sets_of(docs), cands, threshold=0.5)
    found = {(r.doc_a, r.doc_b) for r in verified.collect()}
    planted = {(i, 1000 + i) for i in range(8)}
    # recall: a 1-word mutation of an 80-word doc shares ~96% of shingles;
    # at 128/16 (8 rows/band) collision probability is ~1 per band
    assert planted <= found
    # precision: random docs share almost no shingles; verify kills them
    assert found == planted


def test_multiprobe_ann_finds_hamming1_neighbor(spark):
    rng = random.Random(11)
    dim = 16
    q = [1.0 + 0.1 * k for k in range(dim)]
    planted = list(q)
    planted[0] = -0.01  # flips sign bit 0 only; cosine stays ~0.99
    rows = [(0, q), (900, planted)] + [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(1, 200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    single = sign_lsh_ann(emb, n_queries=1, bits=8, top_k=5, n_probes=1)
    multi = sign_lsh_ann(emb, n_queries=1, bits=8, top_k=5, n_probes=8)
    single_ids = {r.neighbor_id for r in single.collect()}
    multi_ids = {r.neighbor_id for r in multi.collect()}
    # the near-duplicate lives one flipped sign bit away: invisible to a
    # single probe, recovered by multi-probe
    assert 900 not in single_ids
    assert 900 in multi_ids
    assert multi_ids >= single_ids


def test_simhash_32bit_near_dup_distance(spark):
    docs = _corpus(spark, n_base=10)
    sh = {r.doc_id: r.simhash for r in simhash(docs, bits=32).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    near = [ham(sh[i], sh[1000 + i]) for i in range(8)]
    far = [ham(sh[i], sh[j]) for i in range(8) for j in range(i + 1, 8)]
    assert max(near) <= 4  # one-word mutation flips at most a few bits
    assert sum(far) / len(far) > 8  # unrelated docs sit near 16/32 bits


def test_ivf_refine_and_probe(spark):
    """IVF with one Lloyd step: refined centroids move toward their
    cluster means, and probing 2 of 4 cells still finds the planted
    near-duplicate of the query."""
    import random

    from emap_spark.plans.similarity import ivf_ann, ivf_assignments, ivf_refine
    from pyspark.sql import functions as F

    rng = random.Random(3)
    dim = 8
    # 4 well-separated blobs; query = vec 0 (in blob 0), plant vec 900
    # very close to it
    def blob(center, n, start_id):
        return [
            (start_id + j, [center + rng.uniform(-0.3, 0.3) for _ in range(dim)])
            for j in range(n)
        ]

    rows = blob(0.0, 30, 0) + blob(5.0, 30, 100) + blob(-5.0, 30, 200) + blob(10.0, 30, 300)
    # plant a scaled copy of the query vector: same direction -> cosine 1
    rows.append((900, [1.001 * x for x in rows[0][1]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("ce")
    )
    refined = ivf_refine(emb, seeds, iters=1)
    assert refined.count() == 4
    # all 4 seeds start inside blob 0, so before refinement every vector
    # assigns among those 4; after one Lloyd step centroids spread is
    # still data-defined — assignments must cover all seed clusters
    n_clusters = ivf_assignments(emb, refined).select("cluster").distinct().count()
    assert n_clusters >= 2

    out = ivf_ann(emb, n_queries=1, k=4, n_probes=2, top_k=5, iters=1)
    neighbors = {r.neighbor_id for r in out.collect()}
    assert 900 in neighbors  # the planted near-dup is in the probed cells


def test_connected_components_and_survivors(spark):
    """Near-dup clustering (q108's core): multi-hop chains collapse to
    one component labeled by the smallest member; survivors = corpus
    minus non-canonical cluster members; untouched docs pass through."""
    from pyspark.sql import Row, functions as F

    from emap_spark.plans.text_dedup import (
        connected_components,
        near_dup_survivors,
    )

    pairs = spark.createDataFrame(
        [Row(doc_a=5, doc_b=1), Row(doc_a=5, doc_b=3),  # chain 1-5-3
         Row(doc_a=9, doc_b=7)],                        # separate pair
        "doc_a long, doc_b long",
    )
    cc = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 3: 1, 5: 1, 7: 7, 9: 7}

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in (1, 3, 5, 7, 9, 42)],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in near_dup_survivors(docs, pairs).collect())
    assert kept == [1, 7, 42]


def test_decontaminate_flags_planted_benchmark_overlap(spark):
    """q116's operator on a planted corpus: a training doc embedding a
    verbatim benchmark sentence is flagged with the right hit count; a
    clean doc and a short (<8-token) doc are not."""
    from emap_spark.plans.text_dedup import decontaminate

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(300)]
    bench_words = [vocab[rng.randrange(len(vocab))] for _ in range(30)]
    clean_words = [f"c{k}" for k in range(40)]
    # training doc 10 copies benchmark tokens 5..20 verbatim (16 tokens
    # -> 16-8+1 = 9 contaminated 8-grams), padded with clean filler
    leak = clean_words[:10] + bench_words[5:21] + clean_words[10:24]
    rows = [
        (0, " ".join(bench_words), "bench"),
        (10, " ".join(leak), "train"),
        (11, " ".join(clean_words), "train"),
        (12, "too short", "train"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in decontaminate(docs, "bench", 8).collect()}
    assert set(out) == {10}
    assert out[10].n_hit == 9
    assert out[10].n_grams == len(leak) - 7


def test_mixture_sample_is_deterministic_and_rate_accurate(spark):
    """q117's operator: the same input always keeps the same rows, and
    per-source keep fractions track the requested rates."""
    from emap_spark.plans.text_dedup import mixture_sample

    rows = [
        (i, f"doc {i}", ["srcA", "srcB"][i % 2]) for i in range(2000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rate = F.when(F.col("source") == "srcA", F.lit(0.25)).otherwise(F.lit(0.75))
    a = {r.doc_id for r in mixture_sample(docs, rate).collect()}
    b = {r.doc_id for r in mixture_sample(docs, rate).collect()}
    assert a == b  # deterministic
    kept_a = sum(1 for i in a if i % 2 == 0) / 1000
    kept_b = sum(1 for i in a if i % 2 == 1) / 1000
    assert abs(kept_a - 0.25) < 0.05
    assert abs(kept_b - 0.75) < 0.05


def test_span_overlap_flags_boilerplate_mass(spark):
    """q118's operator: a doc that is pure boilerplate shared with
    another doc reports shared_frac 1.0; a unique doc reports 0."""
    from emap_spark.plans.text_dedup import span_overlap_report

    boiler = " ".join(f"b{k}" for k in range(30))
    unique = " ".join(f"u{k}" for k in range(30))
    half = " ".join(f"b{k}" for k in range(15)) + " " + " ".join(
        f"h{k}" for k in range(15)
    )
    docs = spark.createDataFrame(
        [(0, boiler, "s"), (1, boiler, "s"), (2, unique, "s"), (3, half, "s")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in span_overlap_report(docs, 8).collect()}
    assert out[0].shared_frac == 1.0 and out[1].shared_frac == 1.0
    assert out[2].n_shared == 0
    # doc 3's spans starting at positions 1..8 sit fully inside its
    # 15 boilerplate tokens (start i covers i..i+7, i+7 <= 15) and all
    # appear in the boiler doc; every later span crosses into h-tokens
    assert out[3].n_shared == 8 and out[3].n_spans == 23


def test_lang_ngram_id_discriminates_planted_alphabets(spark):
    """q119's classifier on genuinely distinguishable languages: docs
    drawn from disjoint alphabets classify to their own language's
    profile, including a held-out (train-split-excluded) doc."""
    from emap_spark.plans.text_dedup import lang_ngram_id

    rng = random.Random(67)

    def prose(letters, n=120):
        return "".join(
            rng.choice(letters) if rng.random() > 0.18 else " "
            for _ in range(n)
        )

    rows = []
    for i in range(12):
        rows.append((i * 2 + 1, prose("abcdefg"), "aa"))   # odd ids: train
        rows.append((i * 2 + 100, prose("tuvwxyz"), "zz"))
    rows.append((0, prose("abcdefg"), "aa"))    # doc 0: held out of train
    rows.append((200, prose("tuvwxyz"), "zz"))  # held out (200 % 5 == 0)
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in lang_ngram_id(docs).collect()}
    assert all(r.predicted_lang == r.lang for r in out.values()), [
        (r.doc_id, r.lang, r.predicted_lang) for r in out.values()
        if r.predicted_lang != r.lang
    ]
    assert out[0].score > 0 and out[200].score > 0


def test_pii_scrub_counts_and_redacts_planted_pii(spark):
    from emap_spark.plans.text_dedup import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@dept.example.org for the customer list"),
            (2, "server 10.0.255.3 called 212-555-0187 twice"),
            (3, "plain text with a vector and an order inside"),
            (4, "nothing sensitive here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[1].n_email, got[1].n_entity) == (1, 1)
    assert (got[2].n_ipv4, got[2].n_phone) == (1, 1)
    assert (got[3].n_entity, got[3].n_email) == (2, 0)
    assert got[4].n_email == got[4].n_ipv4 == got[4].n_entity == 0
    # redaction is total: no raw hit survives in the fingerprinted text
    red = pii_scrub(docs).select("doc_id", "redacted_len").collect()
    lens = {r.doc_id: r.redacted_len for r in red}
    # doc 1: email (30 chars) -> <EMAIL> (7), customer -> <ENTITY>
    assert lens[1] == len(
        "contact <EMAIL> for the <ENTITY> list"
    )
    assert lens[2] == len("server <IP> called <PHONE> twice")
    assert lens[4] == len("nothing sensitive here at all")


def test_repetition_filter_flags_planted_boilerplate(spark):
    from emap_spark.plans.text_dedup import repetition_stats

    docs = spark.createDataFrame(
        [
            # 10 words, 'spam' x 6 -> top_word_frac 0.6, rejected
            (1, "spam spam spam spam spam spam a b c d"),
            # all-distinct words -> fracs at the floor, kept
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            # repeated BIGRAM dominates while words stay under 0.2:
            # 'x y' appears 3x in 16 words (top_bigram 3/15 = 0.2 OK,
            # top_word 3/16 < 0.2) -> kept at the boundary
            (3, "x y p x y q x y r s t u v w m n"),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].top_word_frac == 0.6 and got[1].keep is False
    assert got[1].dup_word_frac == 0.6  # the 6 spam tokens
    assert got[2].top_word_frac == 0.1 and got[2].keep is True
    assert got[2].dup_word_frac == 0.0
    assert got[3].top_bigram_frac == 0.2 and got[3].keep is True
    assert got[4].n_words == 1 and got[4].top_bigram_frac is None
    # single word -> top_word_frac 1.0 fails the threshold, and
    # false AND null = false (same three-valued AND in the oracle)
    assert got[4].top_word_frac == 1.0 and got[4].keep is False


def test_sequence_packing_boundaries_and_shard_independence(spark):
    from emap_spark.plans.text_dedup import pack_sequences

    # tokens: each word = 1 token; budget 10
    def doc(i, src, n):
        return (i, " ".join(f"t{j}" for j in range(n)), src)

    docs = spark.createDataFrame(
        [
            doc(1, "a", 4),   # pack 0 (start 0)
            doc(2, "a", 4),   # pack 0 (start 4)
            doc(3, "a", 4),   # pack 0 (start 8, crosses into 1)
            doc(4, "a", 12),  # pack 1 (start 12; doc larger than budget)
            doc(5, "a", 1),   # pack 2 (start 24)
            doc(6, "b", 9),   # shard b restarts: pack 0
            doc(7, "b", 2),   # pack 0 (start 9)
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source, r.pack_id): (r.n_docs, r.total_tokens, r.first_doc, r.last_doc)
        for r in pack_sequences(docs, budget=10).collect()
    }
    assert got[("a", 0)] == (3, 12, 1, 3)
    assert got[("a", 1)] == (1, 12, 4, 4)
    assert got[("a", 2)] == (1, 1, 5, 5)
    assert got[("b", 0)] == (2, 11, 6, 7)
    assert len(got) == 4


def test_bpe_pair_frequencies_weighted_and_guarded(spark):
    from emap_spark.plans.text_dedup import bpe_pair_frequencies

    # 'abc' x3 + 'ab' x1 -> ab: 4, bc: 3; single-char 'a' contributes
    # NOTHING (the sequence(1,0)-is-descending guard)
    docs = spark.createDataFrame(
        [(1, "abc abc a"), (2, "abc ab a")], "doc_id long, text string"
    )
    got = [(r.pair, r.pair_count, r.rk) for r in
           bpe_pair_frequencies(docs, top_k=5).collect()]
    assert got == [("ab", 4, 1), ("bc", 3, 2)]


def test_dedup_aware_sample_weights_and_expected_copies(spark):
    from emap_spark.plans.text_dedup import dedup_aware_sample

    # 4 copies of X, 1 of Y: weights 0.25 / 1.0; the draw is
    # deterministic, so kept flags are stable across runs
    docs = spark.createDataFrame(
        [(i, "X X X", "s") for i in range(4)] + [(9, "Y Y Y", "s")],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: r for r in dedup_aware_sample(docs, rate=1.0).collect()}
    assert all(got[i].dup_count == 4 and got[i].weight == 0.25 for i in range(4))
    assert got[9].dup_count == 1 and got[9].weight == 1.0 and got[9].kept
    import hashlib
    expected_kept = {
        i for i in range(4)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32 < 0.25
    }
    assert {i for i in range(4) if got[i].kept} == expected_kept


def test_chunk_documents_spans_and_overlap(spark):
    from emap_spark.plans.text_dedup import chunk_documents

    import pytest as _pytest

    # 10 tokens, chunk 4, overlap 1 -> stride 3: chunks start 0,3,6
    # (covers to 10), i.e. 1 + ceil((10-4)/3) = 3 chunks
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(10))),
         (2, "a b")],  # shorter than one chunk -> exactly one chunk
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.chunk_id): r for r in
           chunk_documents(docs, chunk=4, overlap=1).collect()}
    assert {k for k in got} == {(1, 0), (1, 1), (1, 2), (2, 0)}
    assert (got[(1, 0)].start_token, got[(1, 0)].n_tokens) == (0, 4)
    assert (got[(1, 1)].start_token, got[(1, 1)].n_tokens) == (3, 4)
    assert (got[(1, 2)].start_token, got[(1, 2)].n_tokens) == (6, 4)
    assert (got[(2, 0)].start_token, got[(2, 0)].n_tokens) == (0, 2)
    # adjacent chunks share exactly `overlap` tokens: chunk 0 = t0..t3,
    # chunk 1 = t3..t6 — verified via the fingerprints of known spans
    import hashlib
    assert got[(1, 1)].chunk_md5 == hashlib.md5(b"t3 t4 t5 t6").hexdigest()
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk=4, overlap=4)
