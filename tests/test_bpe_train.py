"""q128 BPE training-loop semantics, pinned against an independent
pure-Python reference implementing textbook BPE: per step, argmax of
corpus-weighted adjacent-pair counts (tie-break count desc, left, right)
then LEFT-TO-RIGHT NON-OVERLAPPING merge application. The adversarial
shapes are self-chaining pairs ("aaa" -> [aa, a], "aaaaa" ->
[aa, aa, a]) where naive replace/fixpoint semantics diverge."""

from __future__ import annotations

from collections import Counter

from emap_spark.plans.text_dedup import bpe_train


def _ref_bpe(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            words[tuple(w)] += 1
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, wc in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, cnt))
        nxt = Counter()
        for syms, wc in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += wc
        words = nxt
    return merges


def _check(spark, texts, n_merges=5):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, n_merges), f"texts={texts}\ngot={got}"


def test_bpe_self_chaining_overlap(spark):
    # runs of the same char: LTR non-overlap is the defining semantics
    _check(spark, ["aaa aaaa aaaaa aaaaaa", "aa a aaa"], n_merges=4)


def test_bpe_merged_symbol_feeds_next_step(spark):
    # step k+1's counts must reflect step k's applied merge: after
    # (l,o)->lo, the corpus's next-best pair involves the NEW symbol
    _check(spark, ["low low low lower lowest", "low slow slower"], n_merges=6)


def test_bpe_tie_breaks_and_singletons(spark):
    # ties resolved (count desc, left, right); single-char words are
    # pairless; multi-space text yields empty words that contribute none
    _check(spark, ["ab cd ab cd", "x y z  q", "a b c"], n_merges=5)


def test_bpe_exhausts_pairs_early(spark):
    # fewer distinct pairs than requested merges: the loop stops clean
    docs_texts = ["ab ab ab"]
    _check(spark, docs_texts, n_merges=8)


def test_bpe_word_table_cap(spark):
    """The 100-TB scale knobs: a generous cap changes nothing; a tight
    top-M cap matches the reference trained on the same truncated word
    multiset (deterministic (count desc, word) truncation); a
    min_count floor likewise; and the capped-train encode still
    tokenizes OOV words (full-word-table re-apply, no silent drops)."""
    from emap_spark.plans.text_dedup import bpe_encode, bpe_train

    texts = ["low low low lower lowest", "low slow slower", "zz qq zz"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def got(**kw):
        return [
            (r.step, r.left, r.right, r.merged, r.pair_count)
            for r in bpe_train(docs, 5, **kw).orderBy("step").collect()
        ]

    def ref_truncated(min_count=1, max_words=None):
        words = Counter(w for t in texts for w in t.split(" "))
        items = [(w, c) for w, c in words.items() if c >= min_count]
        items.sort(key=lambda wc: (-wc[1], wc[0]))
        if max_words is not None:
            items = items[:max_words]
        kept = [w for w, c in items for _ in range(c)]
        return _ref_bpe([" ".join(kept)], 5)

    assert got(max_words=100) == _ref_bpe(texts, 5)  # generous: exact
    assert got(min_count=1) == _ref_bpe(texts, 5)
    assert got(max_words=3) == ref_truncated(max_words=3)
    assert got(min_count=2) == ref_truncated(min_count=2)

    # capped-train encode: every doc keeps a row and every WORD counts
    # toward n_tokens, including words outside the capped table
    enc = {r.doc_id: (r.n_words, r.n_tokens)
           for r in bpe_encode(docs, 5, max_words=3).collect()}
    assert set(enc) == {0, 1, 2}
    for i, t in enumerate(texts):
        n_words = len(t.split(" "))
        assert enc[i][0] == n_words
        # token count bounded: [n_words, total chars]
        assert n_words <= enc[i][1] <= sum(len(w) for w in t.split(" "))


def test_bpe_metachar_symbols_survive_sql_quoting(spark):
    # learned symbols are embedded into Spark SQL string literals; a
    # corpus of code/paths exercises backslashes (Spark's parser
    # escape-processes them — DuckDB/Python do not) and single quotes.
    # Pre-fix, a symbol with a trailing backslash swallowed the closing
    # quote and broke the expression entirely.
    _check(
        spark,
        ["c:\\x c:\\x c:\\x \\\\ \\\\", "'a' 'a' 'a' \\' \\'"],
        n_merges=6,
    )


def test_bpe_encode_matches_reference_tokenization(spark):
    """q129: per-doc token counts after K merges equal the reference
    tokenizer applied with the reference-learned merges."""
    from emap_spark.plans.text_dedup import bpe_encode

    texts = ["low lower lowest aaa", "aaaa low newest", "x aaa aaab"]
    n_merges = 4
    merges = _ref_bpe(texts, n_merges)

    def tok(word):
        syms = list(word)
        for _, a, b, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expected = {
        i: (len(t.split(" ")), sum(tok(w) for w in t.split(" ")))
        for i, t in enumerate(texts)
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_encode(docs, n_merges).collect()
    }
    assert got == expected


def test_bpe_capped_encode_one_pass_matches_kpass_chain(spark):
    """The capped encode's OOV re-apply runs as ONE mapInPandas pass
    over the full distinct-word table (job count independent of K).
    Differential vs the K-pass _apply_merge chain it replaced — the
    sequential per-merge leftmost-greedy semantics must be bit-exact —
    on a fixture with OOV words, repeated-char runs (overlap parity),
    and SQL metacharacters (quotes/backslashes, which the Python path
    need not escape)."""
    from pyspark.sql import functions as F

    from emap_spark.plans.text_dedup import _apply_merge, _bpe_fit, bpe_encode

    texts = [
        "low low low lower lowest aaaa aaa",
        r"pa\th 'quo'ted pa\th low slow slower",
        "zz qq zz aaaa newest widest OOVWORD",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n_merges, cap = 8, 5

    # the old K-pass chain, reconstructed: re-apply learned merges to
    # the FULL word table one _apply_merge pass at a time
    merges, _ = _bpe_fit(docs, n_merges, max_words=cap)
    syms = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .distinct()
        .select(
            "word",
            F.expr(
                "CASE WHEN length(word) >= 1 THEN"
                " transform(sequence(1, length(word)), i -> substring(word, i, 1))"
                " ELSE cast(array() AS array<string>) END"
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    for _, l, r, _, _ in merges:
        syms = _apply_merge(syms, l, r).localCheckpoint(eager=True)
    kpass = {
        r.word: r.nt
        for r in syms.select("word", F.size("s").alias("nt")).collect()
    }

    # the one-pass path, via the public encode: per-doc totals must
    # equal the K-pass chain's word-level counts summed per doc
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_encode(docs, n_merges, max_words=cap).collect()
    }
    expected = {
        i: (len(t.split(" ")), sum(kpass[w] for w in t.split(" ")))
        for i, t in enumerate(texts)
    }
    assert got == expected
