"""Interleaved A/B of the ADT ingest lane between two checkouts.

Same protocol as ab_q60.py (fresh subprocess/JVM per rep, sides
alternating within each pair, fixed-cost CPU probe between reps) but for
the stateful ingest lane: each rep builds a fresh engine, runs the
bench's warm batches, then times the 20k and 100k batches (bench.py's
exact methodology, single rep each — the pairing across alternating
sides is the noise control).

Usage:
    git worktree add /tmp/ab_tree <commit>   # or an edited worktree
    python tools/ab_adt_tree.py /tmp/ab_tree [n_pairs]
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import time

_REP = r'''
import sys, tempfile, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from emap_spark.session import get_spark
spark = get_spark("ab_adt_tree")
from emap_spark.app import EmapEngine
from emap_spark.lineage import cut
from emap_spark.sources.generators import adt_messages

adt = cut(adt_messages(spark, n_patients=5000))
big = cut(adt_messages(spark, n_patients=25000))
warm = cut(adt_messages(spark, n_patients=200))
# bench.py methodology: two warm batches compile steady-state plan
# shapes, then the timed batches; one throwaway engine first so JIT
# tier-up lands outside the timed reps
for tag in ("warmjvm", "timed"):
    eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="ab_adt_tree_"))
    eng.process_batch(warm, 0)
    eng.process_batch(warm.limit(400), 1)
    t0 = time.perf_counter()
    eng.process_batch(adt, 2)
    s20 = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.process_batch(big, 3)
    s100 = time.perf_counter() - t0
print("ADT_SECS", round(s20, 3), round(s100, 3))
'''


def _probe_cpu() -> float:
    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(400):
        h.update(buf)
    assert h.digest()
    return time.perf_counter() - t0


def _rep(repo: str) -> tuple[float, float]:
    out = subprocess.run(
        [sys.executable, "-c", _REP, repo],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ADT_SECS"):
            parts = line.split()
            return float(parts[1]), float(parts[2])
    raise RuntimeError(f"rep failed for {repo}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    head = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    other = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sides = {"HEAD": head, "OTHER": other}
    results: dict[str, list[tuple[float, float]]] = {"HEAD": [], "OTHER": []}
    for i in range(n_pairs):
        order = ["HEAD", "OTHER"] if i % 2 == 0 else ["OTHER", "HEAD"]
        for label in order:
            probe = _probe_cpu()
            s20, s100 = _rep(sides[label])
            results[label].append((s20, s100))
            print(
                f"pair {i + 1} {label}: 20k={s20:.3f}s 100k={s100:.3f}s "
                f"(cpu probe {probe:.3f}s)",
                flush=True,
            )
    for idx, name in ((0, "20k"), (1, "100k")):
        h = [r[idx] for r in results["HEAD"]]
        o = [r[idx] for r in results["OTHER"]]
        wins = sum(1 for a, b in zip(h, o) if a < b)
        print(
            f"{name}: HEAD min={min(h):.3f} median={sorted(h)[len(h) // 2]:.3f} | "
            f"OTHER min={min(o):.3f} median={sorted(o)[len(o) // 2]:.3f} | "
            f"HEAD wins {wins}/{len(h)} pairs"
        )


if __name__ == "__main__":
    main()
