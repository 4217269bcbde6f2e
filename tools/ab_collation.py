"""Interleaved A/B of the waveform-collation bench lane between two checkouts.

r9: the waveform generator's per-message sample array was unrolled from
transform(sequence(...), lambda) — a CodegenFallback higher-order
function evaluated interpreted per element — into static codegen'd
expressions. This tool measures the collation lane (generator +
collate_batch, bench.py's exact methodology) HEAD-vs-other: fresh JVM
per rep, sides alternating within each pair so box drift cancels,
min-of-2 per rep, and a fixed-cost CPU probe between reps as box
evidence.

Usage:
    git worktree add /tmp/coll_ab <pre-change-commit>
    python tools/ab_collation.py /tmp/coll_ab [n_pairs]
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
from emap_spark.sources.generators import waveform_stream
from emap_spark.streaming.collation import collate_batch
spark = get_spark("ab_collation")
# bench.py methodology: warm the Python-worker/Arrow path first, then
# interleaved min-of-2 timed reps of the full 540k-sample lane
collate_batch(
    waveform_stream(spark, n_patients=2, sampling_rate=300, seconds=2)
).write.format("noop").mode("overwrite").save()
msgs = waveform_stream(spark, n_patients=30, sampling_rate=300, seconds=60,
                       samples_per_message=40)
best = None
for _ in range(2):
    t0 = time.perf_counter()
    collate_batch(msgs).write.format("noop").mode("overwrite").save()
    s = time.perf_counter() - t0
    best = s if best is None or s < best else best
print("COLL_SECS", round(best, 3))
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
        if line.startswith("COLL_SECS"):
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
        pair: dict[str, float] = {}
        for label in order:
            probe = _probe_cpu()
            secs = _rep(sides[label])
            results[label].append(secs)
            pair[label] = secs
            print(f"pair {i} {label}: {secs:.3f} s (probe {probe:.3f})", flush=True)
        w = "HEAD" if pair["HEAD"] < pair["OTHER"] else "OTHER"
        print(f"pair {i} winner: {w}", flush=True)
    for label, xs in results.items():
        print(
            f"{label}: min {min(xs):.3f} median {sorted(xs)[len(xs) // 2]:.3f}"
            f" all {[round(x, 3) for x in xs]}"
        )
    wins = sum(
        1 for a, b in zip(results["HEAD"], results["OTHER"]) if a < b
    )
    print(f"HEAD paired wins: {wins}/{n_pairs}")


if __name__ == "__main__":
    main()
