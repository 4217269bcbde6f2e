"""q47/q57 at sf1-equivalent scale (VERDICT r9 #5).

The sf0.1 bench is fixed-cost-bound (8 cores ~= 32), so this probe runs
the LSH dedup pipeline over a synthetic 10x corpus — the sf0.1
documents table replicated with per-copy doc_id prefixes, i.e. a
duplicate-heavy corpus exactly like a crawl with re-posts — and reports
wall time, rows, and scan/shuffle task counts at 1x vs 10x. The claim
under test: the pipeline's cost scales with data (no driver collapse,
no quadratic blowup beyond the true duplicate structure).

Usage: python tools/probe_lsh_scale.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

from emap_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("probe_lsh_scale")
    from emap_spark.plans.text_dedup import (
        _SHINGLE_EXPR,
        _words,
        lsh_candidate_pairs,
        verify_candidates,
    )
    from emap_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def corpus(k: int):
        c = base
        if k > 1:
            c = base.withColumn("__c", F.explode(F.array(*[F.lit(i) for i in range(k)])))
            c = c.select(
                F.concat_ws("-", F.col("__c").cast("string"), "doc_id").alias("doc_id"),
                "text",
            )
        return c.repartition(spark.sparkContext.defaultParallelism)

    def run(k: int) -> None:
        docs = corpus(k)
        n = docs.count()
        w = _words(docs)
        shingles = w.select("doc_id", F.explode(F.expr(_SHINGLE_EXPR)).alias("s"))
        sets = w.select("doc_id", F.expr(_SHINGLE_EXPR).alias("sh"))
        sc = spark.sparkContext
        t0 = time.perf_counter()
        sc.setJobDescription(f"lsh-pairs x{k}")
        cands = lsh_candidate_pairs(shingles)
        cands.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        sc.setJobDescription(f"lsh-verified x{k}")
        verified = verify_candidates(sets, cands)
        verified.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sc.setJobDescription(None)
        print(
            f"x{k}: docs={n}  pairs_pass={t1 - t0:7.2f}s  "
            f"verify_pass={t2 - t1:7.2f}s  total={t2 - t0:7.2f}s",
            flush=True,
        )

    run(1)  # warm + baseline
    run(1)  # steady-state baseline
    run(factor)
    run(factor)  # repeat to separate JIT from scale


if __name__ == "__main__":
    main()
