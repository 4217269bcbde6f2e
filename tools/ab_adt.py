"""Interleaved A/B of the ADT ingest lane under an env-var knob.

One session, fresh engine per rep, sides alternating within each pair
(A,B then B,A) so box drift cancels — the same protocol that validated
the r8 delta-write lever. The knob is read per-batch by the code under
test, so flipping os.environ between reps is a true toggle.

Usage: python tools/ab_adt.py KNOB A_VALUE B_VALUE [n_pairs]
    e.g. python tools/ab_adt.py EMAP_FOLD_ROWS_PER_TASK 2500 1250 4
A_VALUE/B_VALUE of "unset" removes the var for that side.
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
    knob, a_val, b_val = sys.argv[1], sys.argv[2], sys.argv[3]
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    spark = get_spark("ab_adt")
    from emap_spark.app import EmapEngine
    from emap_spark.lineage import cut
    from emap_spark.sources.generators import adt_messages

    adt = cut(adt_messages(spark, n_patients=5000))
    big = cut(adt_messages(spark, n_patients=25000))
    warm = cut(adt_messages(spark, n_patients=200))

    def rep(val: str) -> tuple[float, float]:
        if val == "unset":
            os.environ.pop(knob, None)
        else:
            os.environ[knob] = val
        try:
            eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="ab_adt_"))
            eng.process_batch(warm, 0)
            eng.process_batch(warm.limit(400), 1)
            t0 = time.perf_counter()
            eng.process_batch(adt, 2)
            s20 = time.perf_counter() - t0
            t0 = time.perf_counter()
            eng.process_batch(big, 3)
            return s20, time.perf_counter() - t0
        finally:
            os.environ.pop(knob, None)

    # one throwaway warm rep so JIT tier-up doesn't land inside pair 1
    rep(a_val)

    res: dict[str, list[tuple[float, float]]] = {"A": [], "B": []}
    vals = {"A": a_val, "B": b_val}
    for i in range(n_pairs):
        order = ["A", "B"] if i % 2 == 0 else ["B", "A"]
        for side in order:
            s20, s100 = rep(vals[side])
            res[side].append((s20, s100))
            print(
                f"pair {i + 1} {side} ({knob}={vals[side]}):"
                f" 20k {s20:.3f}s  100k {s100:.3f}s",
                flush=True,
            )
    for side in ("A", "B"):
        xs20 = [x for x, _ in res[side]]
        xs100 = [y for _, y in res[side]]
        print(
            f"{side} ({knob}={vals[side]}): 20k min {min(xs20):.3f}"
            f" med {sorted(xs20)[len(xs20) // 2]:.3f} |"
            f" 100k min {min(xs100):.3f} med {sorted(xs100)[len(xs100) // 2]:.3f}"
        )
    w20 = sum(1 for a, b in zip(res["A"], res["B"]) if a[0] < b[0])
    w100 = sum(1 for a, b in zip(res["A"], res["B"]) if a[1] < b[1])
    print(f"A wins 20k {w20}/{n_pairs}, 100k {w100}/{n_pairs}")


if __name__ == "__main__":
    main()
