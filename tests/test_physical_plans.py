"""Physical-plan regression tests: the scale properties the engine
relies on (SURVEY §4) must survive refactors — predicate pushdown to the
parquet scan, column pruning, broadcast of dimension tables."""

from __future__ import annotations

import pytest

from emap_spark.registry import queries

QS = queries()


def plan_of(spark, sf_dir, name: str) -> str:
    return QS[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reaches the scan
    # pruning: only the 6 needed columns are read, not all 11
    assert "l_orderkey" not in plan.split("ReadSchema:")[1]


def test_q03_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q03_local_supplier_revenue")
    assert plan.count("BroadcastHashJoin") >= 4  # dims broadcast, no SMJ
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed down


def test_q06_all_predicates_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q06_revenue_forecast")
    assert "GreaterThanOrEqual(l_shipda" in plan
    read = plan.split("ReadSchema:")[1]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read
    assert "l_returnflag" not in read


def test_events_scan_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q20_latest_event_per_user")
    read = plan.split("ReadSchema:")[1]
    assert "props" not in read  # unused JSON column not read


def test_knn_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q50_knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_aqe_skew_join_enabled(spark):
    """Join skew is AQE's job (runtime split of oversized shuffle
    partitions); the session factory must keep it on."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_salted_agg_two_shuffles_and_correct(spark, sf_dir):
    """Aggregation skew: salted_agg must (a) shuffle first on
    (key, __salt) so a hot key spreads across reducers, then combine on
    the key alone, and (b) agree exactly with the plain aggregation."""
    from pyspark.sql import functions as F

    from emap_spark.operators.skew import salted_agg, salted_count_distinct
    from emap_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    # manufacture a hot key: a third of all rows collapse onto user -1
    skewed = e.withColumn(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, F.lit(-1)).otherwise(F.col("user_id")),
    ).withColumn("value", F.col("value").cast("decimal(18,4)"))  # exact sums
    out = salted_agg(
        skewed,
        ["user_id"],
        [("value", "sum", "total"), ("event_id", "max", "max_event")],
        n_salt=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # first shuffle carries the salt
    plain = skewed.groupBy("user_id").agg(
        F.sum("value").alias("total"), F.max("event_id").alias("max_event")
    )
    diff = out.exceptAll(plain).count() + plain.exceptAll(out).count()
    assert diff == 0

    cd = salted_count_distinct(skewed, ["user_id"], "event_type", n_salt=8)
    plain_cd = skewed.groupBy("user_id").agg(
        F.count_distinct("event_type").alias("n_distinct_event_type")
    )
    assert cd.exceptAll(plain_cd).count() + plain_cd.exceptAll(cd).count() == 0


def test_new_round3_queries_plan_hygiene(spark, sf_dir):
    """Plan audit for the round-3 operators: candidate joins stay
    hash/broadcast equi-joins (never cartesian), and the salted agg
    keeps its two-phase shape in the driver-checked query."""
    for name in (
        "q59_cosine_near_dup_pairs",
        "q101_hl7_clinical_factories",
        "q102_media_builtin_decode",
        "q103_salted_hot_key_agg",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
    p59 = plan_of(spark, sf_dir, "q59_cosine_near_dup_pairs")
    # bucket equi-join drives the candidate generation
    assert "ShuffledHashJoin" in p59 or "SortMergeJoin" in p59 or "BroadcastHashJoin" in p59
    p103 = plan_of(spark, sf_dir, "q103_salted_hot_key_agg")
    assert "__salt" in p103


def test_near_dup_survivors_no_forced_broadcast(spark):
    """VERDICT r4 #2: the survivor anti-join must not FORCE a broadcast
    of the removed set — it scales with the corpus dup rate (many GB at
    100 TB), so the plan decision belongs to AQE/the size threshold.
    With the threshold disabled, a hinted broadcast would still appear
    in the plan; a hint-free join must not."""
    from pyspark.sql import functions as F

    from emap_spark.plans.text_dedup import near_dup_survivors

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = spark.range(40).select(
        (F.col("id") * 2).alias("doc_a"), (F.col("id") * 2 + 1).alias("doc_b")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = near_dup_survivors(docs, pairs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
        # and the result is still the survivor set (evens survive)
        got = sorted(r.doc_id for r in out.collect())
        assert got == sorted(set(range(100)) - {2 * i + 1 for i in range(40)})
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ppm_decoder_accepts_spec_variants():
    """The builtin PPM parser follows the Netpbm spec, not just the
    fixture writer's layout: comments between header tokens, arbitrary
    whitespace separators, and maxval > 255 (2-byte big-endian samples)
    all decode; a truncated header raises rather than mis-parsing."""
    import numpy as np
    import pytest

    from emap_spark.multimodal.binary_ops import _decode_ppm

    raster = bytes(range(12))  # 2x2 RGB
    std = _decode_ppm(b"P6\n2 2\n255\n" + raster)
    fancy = _decode_ppm(
        b"P6 # comment\n# full comment line\n 2\t2 # wh\n255 " + raster
    )
    assert std["pixels_or_samples"] == fancy["pixels_or_samples"] == 4
    assert np.array_equal(std["pixels"], fancy["pixels"])

    r16 = b"".join(int(v).to_bytes(2, "big") for v in range(12))
    wide = _decode_ppm(b"P6\n2 2\n65535\n" + r16)
    assert wide["maxval"] == 65535 and wide["peak"] == 11.0

    with pytest.raises(ValueError):
        _decode_ppm(b"P6\n2 2\n")  # truncated header
    with pytest.raises(ValueError):
        _decode_ppm(b"P5\n2 2\n255\n" + raster)  # not P6


def test_resize_rescales_16bit_ppm(spark):
    """ADVICE r4: resize_images re-encodes at maxval 255, so 16-bit
    inputs must RESCALE (v * 255/maxval), not truncate mod 256 — a
    uniform 32768-valued 16-bit image resizes to 128s, not 0s."""
    from emap_spark.multimodal.binary_ops import resize_images

    r16 = (32768).to_bytes(2, "big") * 12  # 2x2 RGB, all samples 32768
    payload = b"P6\n2 2\n65535\n" + r16
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))], "media_id long, kind string, payload binary"
    )
    row = resize_images(media, 2, 2).collect()[0]
    assert row.mean_value == 128.0  # round(32768 * 255 / 65535)
    assert bytes(row.payload).endswith(bytes([128]) * 12)


def test_ivf_pq_corpus_side_stays_broadcast_joined(spark, sf_dir):
    """q115's 100 TB shape: every join the corpus flows through is a
    BROADCAST join (centroids, codebook, per-(query,cell) ADC tables —
    all tiny by construction), so the corpus never shuffles for a join;
    its only exchanges are the per-vector/per-query aggregation folds.
    No sort-merge or shuffled-hash join may appear."""
    plan = plan_of(spark, sf_dir, "q115_ivf_pq_topk")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_decontamination_broadcasts_benchmark_grams(spark, sf_dir):
    """q116's 100 TB shape: the held-out benchmark gram set is the
    broadcast side of the contamination join — the training corpus is
    never shuffled against it."""
    plan = plan_of(spark, sf_dir, "q116_benchmark_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_corpus_prep_ops_plan_hygiene(spark, sf_dir):
    """q121/q122 are corpus-linear projections (no hash exchange, no
    window, no join — only the _docs round-robin fan-out); q123 shuffles
    exactly once on the shard key, its cumulative-sum window is
    PARTITIONED (never a global single-task window), and the final
    group-by reuses the shard partitioning (no second exchange)."""
    for name in ("q121_pii_scrub", "q122_repetition_filter"):
        plan = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in plan, name
        assert "Window" not in plan, name
        assert "Join" not in plan, name
    plan = plan_of(spark, sf_dir, "q123_sequence_packing")
    assert plan.count("hashpartitioning") == 1
    assert "hashpartitioning(source" in plan
    assert "windowspecdefinition(source" in plan


def test_bpe_encode_broadcasts_word_token_counts(spark, sf_dir):
    """q129's 100 TB shape: the distinct-word token-count table is the
    BROADCAST side of the tokenization join — the corpus-side explode
    is never sort-merge-shuffled against the vocabulary; the only
    corpus exchange is the final per-doc groupBy."""
    plan = plan_of(spark, sf_dir, "q129_bpe_encode")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_delta_commit_write_rides_fold_partitioning(spark, tmp_path):
    """The r8 ingest lever, pinned: when the caller declares a fold
    parallelism within the small-file bound, DeltaLog.commit writes the
    combined frame WITHOUT its re-narrowing round-robin exchange (the
    write rides the fold's own REPARTITION_BY_NUM stage); an
    over-parallel fold still re-narrows to n_delta_files."""
    from pyspark.sql import functions as F

    from emap_spark.storage.delta import DeltaLog

    rows = [(f"k{i}", i, 1, None, None) for i in range(100)]
    df = (
        spark.createDataFrame(
            rows, "k string, v long, __rk int, valid_until timestamp_ntz,"
            " stored_until timestamp_ntz"
        )
        .repartition(8, F.col("k"))
    )

    log = DeltaLog(str(tmp_path), "t", ["k"])
    log.load(spark)
    log.commit(0, df, n_parts=8)  # within 4x n_delta_files: no exchange
    d0 = str(tmp_path / "tables" / "t" / "delta" / "batch=0")
    import glob as _g
    n_files_direct = len(_g.glob(d0 + "/*.parquet"))
    assert n_files_direct == 8  # fold partitioning = file count

    log2 = DeltaLog(str(tmp_path), "t2", ["k"])
    log2.load(spark)
    log2.commit(0, df, n_parts=1000)  # cluster-scale: re-narrowed
    d1 = str(tmp_path / "tables" / "t2" / "delta" / "batch=0")
    assert len(_g.glob(d1 + "/*.parquet")) <= log2.n_delta_files

    # both layouts read back identically
    a = sorted((r.k, r.v) for r in log.read_current().collect())
    b = sorted((r.k, r.v) for r in log2.read_current().collect())
    assert a == b and len(a) == 100

    # a STALE caller declaration cannot leak small files: declare a
    # within-bound n_parts while the frame actually carries far more
    # partitions — the post-write clamp re-narrows to n_delta_files
    log3 = DeltaLog(str(tmp_path), "t3", ["k"])
    log3.load(spark)
    wide = df.repartition(300)  # actual plan >> declared parallelism
    log3.commit(0, wide, n_parts=8)
    d2 = str(tmp_path / "tables" / "t3" / "delta" / "batch=0")
    assert len(_g.glob(d2 + "/*.parquet")) <= log3.n_delta_files
    c = sorted((r.k, r.v) for r in log3.read_current().collect())
    assert c == a


def test_bm25_topk_plan_hygiene(spark, sf_dir):
    """q132: df and corpus stats stay broadcast (no SMJ for the tiny
    sides), top-k is TakeOrdered (no global range-partitioned sort),
    and the score fold is an array aggregate (bit-deterministic under
    any partitioning — no unpinned float SUM)."""
    plan = plan_of(spark, sf_dir, "q132_bm25_topk")
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("CartesianProduct") == 0
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # top-k never global-sorts
    # the score rides a collect_list fold, not an unpinned float SUM
    # (plan stringification truncates the lambda, so pin the collector
    # and the absence of a sum over the contribution column)
    assert "collect_list" in plan
    assert "sum(c#" not in plan


def test_length_distribution_never_sorts_raw_rows(spark, sf_dir):
    """q133: exact percentiles ride the length HISTOGRAM (bounded by
    distinct lengths) — the raw per-document rows are never window- or
    range-sorted (a language's documents are billions of rows at corpus
    scale), and the totals side stays broadcast."""
    plan = plan_of(spark, sf_dir, "q133_length_distribution")
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") == 1
    assert "rangepartitioning" not in plan
    # the window's sort appears AFTER the histogram aggregate: the only
    # hash-aggregate upstream of the first Sort is the dl-histogram
    first_sort = plan.index("Sort [")
    assert "HashAggregate" in plan[first_sort:]


def test_first_batch_merge_fold_one_sort_no_join(spark, sf_dir):
    """r9 fold-plan pins: (a) merge_batch against a None current plans
    NO join at all — empty_current's limit(0) lets
    PropagateEmptyRelation rewrite the full-outer join to a null-padded
    projection of the candidate side (statically, so it also covers the
    AQE-off ingest batch window); (b) the fold's whole-partition
    tombstone max rides the ordered window spec, so the whole fold runs
    on ONE sort of the batch (previously a key-only sort for the
    tombstone window plus a (key, t, seq) re-sort)."""
    plan = plan_of(spark, sf_dir, "q60_merge_engine_snapshot")
    assert "SortMergeJoin" not in plan
    assert "Join" not in plan
    assert plan.count("+- Sort ") == 1
    # the one exchange is the user repartition on the merge key
    assert plan.count("+- Exchange ") == 1


def test_lsh_self_join_is_sort_merge(spark, sf_dir):
    """r9 deliberate join strategy (guide §3.1): the LSH band self-join
    carries a MERGE hint so the small-scale plan matches the 100 TB
    shape (both sides above the broadcast threshold -> SMJ) instead of
    a BroadcastHashJoin whose build side re-runs the whole signature
    pipeline behind a driver-side relation build."""
    plan = plan_of(spark, sf_dir, "q47_minhash_lsh_pairs")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
