"""Quick ADT ingest timing (min-of-N, no event log) for perf iteration.

Usage: python tools/adt_quick.py [n_reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("adt_quick")
    from emap_spark.app import EmapEngine
    from emap_spark.lineage import cut
    from emap_spark.sources.generators import adt_messages

    adt = cut(adt_messages(spark, n_patients=5000))
    big = cut(adt_messages(spark, n_patients=25000))
    warm = cut(adt_messages(spark, n_patients=200))

    best20, best100 = None, None
    for i in range(reps):
        eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="quick_adt_"))
        eng.process_batch(warm, 0)
        eng.process_batch(warm.limit(400), 1)
        t0 = time.perf_counter()
        eng.process_batch(adt, 2)
        s20 = time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.process_batch(big, 3)
        s100 = time.perf_counter() - t0
        print(
            f"rep {i}: 20k {s20:.3f}s ({20_000 / s20:,.0f} msg/s)  "
            f"100k {s100:.3f}s ({100_000 / s100:,.0f} msg/s)"
        )
        best20 = s20 if best20 is None else min(best20, s20)
        best100 = s100 if best100 is None else min(best100, s100)
    print(
        f"BEST: 20k {best20:.3f}s ({20_000 / best20:,.0f} msg/s)  "
        f"100k {best100:.3f}s ({100_000 / best100:,.0f} msg/s)"
    )


if __name__ == "__main__":
    main()
