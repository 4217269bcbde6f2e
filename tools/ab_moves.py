"""Interleaved A/B of an env-gated ingest lever (one process,
alternating legacy/lever per rep pair).

Usage: python tools/ab_moves.py [pairs] [KNOB=legacy_value]
e.g.   python tools/ab_moves.py 4 EMAP_DELTA_WRITE=legacy
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
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    knob, legacy_val = (sys.argv[2] if len(sys.argv) > 2
                        else "EMAP_DELTA_WRITE=legacy").split("=")
    spark = get_spark("ab_ingest")
    from emap_spark.app import EmapEngine
    from emap_spark.lineage import cut
    from emap_spark.sources.generators import adt_messages

    adt = cut(adt_messages(spark, n_patients=5000))
    big = cut(adt_messages(spark, n_patients=25000))
    warm = cut(adt_messages(spark, n_patients=200))

    best = {("legacy", 20): None, ("legacy", 100): None,
            ("lever", 20): None, ("lever", 100): None}
    for i in range(pairs):
        for mode in ("legacy", "lever"):
            os.environ[knob] = legacy_val if mode == "legacy" else ""
            eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix=f"ab_{mode}_"))
            eng.process_batch(warm, 0)
            eng.process_batch(warm.limit(400), 1)
            t0 = time.perf_counter()
            eng.process_batch(adt, 2)
            s20 = time.perf_counter() - t0
            t0 = time.perf_counter()
            eng.process_batch(big, 3)
            s100 = time.perf_counter() - t0
            print(f"pair {i} {mode}: 20k {s20:.3f}s  100k {s100:.3f}s", flush=True)
            for key, s in ((( mode, 20), s20), ((mode, 100), s100)):
                best[key] = s if best[key] is None else min(best[key], s)
    print("\nMIN  legacy 20k %.3f  lever 20k %.3f  (%.1f%%)" % (
        best[("legacy", 20)], best[("lever", 20)],
        100 * (best[("legacy", 20)] - best[("lever", 20)]) / best[("legacy", 20)]))
    print("MIN  legacy 100k %.3f  lever 100k %.3f  (%.1f%%)" % (
        best[("legacy", 100)], best[("lever", 100)],
        100 * (best[("legacy", 100)] - best[("lever", 100)]) / best[("legacy", 100)]))


if __name__ == "__main__":
    main()
