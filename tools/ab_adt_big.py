"""Large-batch ADT probe (VERDICT r9 #5 + the #3 AQE flip point).

The sf0.1 bench cannot distinguish parallel-path improvements (the r9
scaling block: 8 cores ~= 32 at this scale), so scale evidence comes
from a bigger staged batch: one engine drives a ~1M-row ADT batch, with
the batch-window AQE knob A/B'd in alternating pairs, and the
fold-parallelism formula's output recorded per batch size.

Usage: python tools/ab_adt_big.py [n_pairs] [n_patients]
    default 3 pairs, 250000 patients (= 1M messages).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from emap_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_patients = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    spark = get_spark("ab_adt_big")
    from emap_spark.app import EmapEngine
    from emap_spark.lineage import cut
    from emap_spark.sources.generators import adt_messages

    warm = cut(adt_messages(spark, n_patients=200))
    big = cut(adt_messages(spark, n_patients=n_patients))
    n_rows = big.count()
    print(f"batch rows: {n_rows}")

    def rep(mode: str) -> float:
        os.environ["EMAP_BATCH_AQE"] = mode
        try:
            eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="ab_big_"))
            eng.process_batch(warm, 0)
            eng.process_batch(warm.limit(400), 1)
            t0 = time.perf_counter()
            eng.process_batch(big, 2)
            secs = time.perf_counter() - t0
            par = eng.pipeline._fold_parallelism(big)
            print(
                f"  {mode:4s} {secs:7.3f}s  fold_parallelism={par} "
                f"aqe_in_merge_window={eng.pipeline._last_batch_aqe}",
                flush=True,
            )
            return secs
        finally:
            os.environ.pop("EMAP_BATCH_AQE", None)

    rep("off")  # throwaway JIT warm
    res = {"off": [], "on": []}
    for p in range(n_pairs):
        order = ("off", "on") if p % 2 == 0 else ("on", "off")
        for m in order:
            res[m].append(rep(m))
    for m, xs in res.items():
        xs = sorted(xs)
        print(f"{m}: min {xs[0]:.3f} med {xs[len(xs)//2]:.3f} all {[round(x,3) for x in xs]}")
    wins = sum(1 for a, b in zip(res["off"], res["on"]) if a < b)
    print(f"off wins {wins}/{n_pairs * 1} pairs (paired by rep index)")


if __name__ == "__main__":
    main()
