"""Profile the ADT ingest lane (bench.py's adt_messages_per_sec metrics).

Runs the same warm + 20k + 100k batches as bench.py with the Spark event
log enabled, then parses the event log into a per-stage cost table so a
regression can be named, not guessed (VERDICT r5 #1).

Usage: python tools/profile_adt.py [--batches 20k,100k]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from emap_spark.session import get_spark  # noqa: E402


def main() -> None:
    evdir = tempfile.mkdtemp(prefix="adt_eventlog_")
    spark = get_spark(
        "adt_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    from emap_spark.app import EmapEngine
    from emap_spark.lineage import cut
    from emap_spark.sources.generators import adt_messages

    adt = cut(adt_messages(spark, n_patients=5000))
    big = cut(adt_messages(spark, n_patients=25000))
    warm = cut(adt_messages(spark, n_patients=200))

    # steady-state option: run N full throwaway engines first so the
    # profiled engine sees the same JIT-warm JVM as bench.py's min-of-3
    # best rep (the cold first engine's profile is dominated by tier-up)
    for _ in range(int(os.environ.get("EMAP_PROFILE_PREWARM", "0"))):
        pre = EmapEngine(storage_root=tempfile.mkdtemp(prefix="prof_adt_"))
        pre.process_batch(warm, 0)
        pre.process_batch(warm.limit(400), 1)
        pre.process_batch(adt, 2)
        pre.process_batch(big, 3)

    eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="prof_adt_"))
    eng.process_batch(warm, 0)
    eng.process_batch(warm.limit(400), 1)

    marks = {}
    t0, e0 = time.perf_counter(), time.time() * 1000
    eng.process_batch(adt, 2)
    marks["20k"] = (t0, time.perf_counter(), e0, time.time() * 1000)

    t0, e0 = time.perf_counter(), time.time() * 1000
    eng.process_batch(big, 3)
    marks["100k"] = (t0, time.perf_counter(), e0, time.time() * 1000)

    for name, (a, b, _, _) in marks.items():
        n = 20_000 if name == "20k" else 100_000
        print(f"{name}: {b - a:.3f}s  {n / (b - a):,.0f} msg/s")

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: stage durations within each marked interval
    # (event timestamps are epoch millis; perf_counter isn't — use the
    # submission-order heuristic: stages sorted by submission time, and
    # the two timed intervals are the LAST two dense groups)
    import glob

    logs = glob.glob(os.path.join(evdir, app_id + "*")) + glob.glob(
        os.path.join(evdir, "*", "events_*")
    )
    stages = []
    lines: list[str] = []
    stage2desc: dict[int, str] = {}
    task_time: dict[int, list] = {}
    for log in logs:
        with open(log) as fh:
            lines.extend(fh.readlines())
    if True:
        for line in lines:
            ev = json.loads(line)
            if ev.get("Event") == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ) or (ev.get("Properties") or {}).get("callSite.short", "")
                for sid in ev.get("Stage IDs", []):
                    stage2desc[sid] = desc[:40]
            if ev.get("Event") == "SparkListenerTaskEnd":
                tm = ev.get("Task Metrics") or {}
                sid = ev.get("Stage ID")
                run_ms = tm.get("Executor Run Time", 0)
                cpu_ms = (tm.get("Executor CPU Time", 0)) / 1e6
                task_time.setdefault(sid, [0.0, 0.0])
                task_time[sid][0] += run_ms
                task_time[sid][1] += cpu_ms
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                stages.append(
                    {
                        "id": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:90],
                        "tasks": si["Number of Tasks"],
                        "ms": comp - sub,
                        "sub": sub,
                    }
                )
    stages.sort(key=lambda s: s["sub"])
    print(f"\n{len(stages)} stages total")
    for name, (_, _, ea, eb) in marks.items():
        grp = [s for s in stages if ea <= s["sub"] <= eb]
        tot = sum(s["ms"] for s in grp)
        trun = sum(task_time.get(s["id"], [0, 0])[0] for s in grp)
        tcpu = sum(task_time.get(s["id"], [0, 0])[1] for s in grp)
        print(f"\n== {name} batch: {len(grp)} stages, sum {tot} ms, wall {eb - ea:.0f} ms, taskrun {trun:.0f} ms, taskcpu {tcpu:.0f} ms ==")
        for s in sorted(grp, key=lambda s: -s["ms"])[:25]:
            d = stage2desc.get(s["id"], "?")
            tt = task_time.get(s["id"], [0.0, 0.0])
            print(f"  stage {s['id']:>4}  {s['ms']:>7} ms  {s['tasks']:>3} tasks  run {tt[0]:>8.0f} cpu {tt[1]:>8.0f} [{d}] name={s['name']}")
        # timeline: per-100ms tick, how many stages were running — gaps
        # (ticks with 0 running) are driver/analysis/commit time
        ticks = int((eb - ea) // 100) + 1
        running = [0] * ticks
        for s in grp:
            a = max(0, int((s["sub"] - ea) // 100))
            b = min(ticks - 1, int((s["sub"] + s["ms"] - ea) // 100))
            for i in range(a, b + 1):
                running[i] += 1
        idle = sum(1 for r in running if r == 0) * 100
        print(f"  timeline ({ticks} ticks of 100ms): idle(driver-bound)={idle} ms")
        print("  " + "".join(str(min(r, 9)) for r in running))


if __name__ == "__main__":
    main()
