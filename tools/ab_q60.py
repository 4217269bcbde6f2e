"""Interleaved A/B of q60 (merge-engine snapshot) between two checkouts.

VERDICT r8 #2: q60's driver bench time drifted 1.416 -> 1.537 -> 1.732 s
over rounds 6-8 while its physical plan stayed identical (1 SMJ, 2
exchanges). Nobody A/B'd HEAD against the r6 tip on one box; this tool
does exactly that — fresh engine per rep (subprocess: own JVM), sides
alternating within each pair so box drift cancels, min-of-2 per rep
(bench.py's estimator), and a fixed-cost CPU probe between reps as box
evidence.

Usage:
    git worktree add /tmp/q60_ab_r6 <r6-commit>
    python tools/ab_q60.py /tmp/q60_ab_r6 [n_pairs]
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import time

_REP = r'''
import sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from emap_spark.session import get_spark
from emap_spark.registry import queries
spark = get_spark("ab_q60")
q = queries()["q60_merge_engine_snapshot"]
sf, warm = "/root/testdata/sf0.1", "/root/testdata/sf0.001"
# bench.py methodology: plan-cache warm at sf0.001, one full-scale pass
# to settle JIT tier-up, then interleaved min-of-2 timed reps
q(spark, warm).write.format("noop").mode("overwrite").save()
q(spark, sf).write.format("noop").mode("overwrite").save()
best = None
for _ in range(2):
    t0 = time.perf_counter()
    q(spark, sf).write.format("noop").mode("overwrite").save()
    s = time.perf_counter() - t0
    best = s if best is None or s < best else best
print("Q60_SECS", round(best, 3))
'''


def _probe_cpu() -> float:
    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(400):
        h.update(buf)
    assert h.digest()
    return time.perf_counter() - t0


def _rep(repo: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _REP, repo],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("Q60_SECS"):
            return float(line.split()[1])
    raise RuntimeError(f"rep failed for {repo}:\n{out.stdout}\n{out.stderr}")


def main() -> None:
    head = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    other = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sides = {"HEAD": head, "OTHER": other}
    results: dict[str, list[float]] = {"HEAD": [], "OTHER": []}
    for i in range(n_pairs):
        order = ["HEAD", "OTHER"] if i % 2 == 0 else ["OTHER", "HEAD"]
        for label in order:
            probe = _probe_cpu()
            secs = _rep(sides[label])
            results[label].append(secs)
            print(
                f"pair {i + 1} {label:>5}: {secs:.3f} s  (cpu probe {probe:.3f})",
                flush=True,
            )
    for label, xs in results.items():
        print(
            f"{label}: min {min(xs):.3f}  median {sorted(xs)[len(xs) // 2]:.3f}"
            f"  all {[round(x, 3) for x in xs]}"
        )
    wins = sum(1 for a, b in zip(results["HEAD"], results["OTHER"]) if a < b)
    print(f"HEAD wins {wins}/{n_pairs} pairs")


if __name__ == "__main__":
    main()
