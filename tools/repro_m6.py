"""Standalone repro + greedy minimizer for the r7 mult-8 falsifier
(test_mixed_trust_per_key_agrees_with_model). Prints model vs engine
per granularity, then greedily drops messages/batches while the
mismatch persists."""

from __future__ import annotations

import datetime
import itertools as it
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from pyspark.sql import Row

from emap_spark.session import get_spark

RAW = [
    {'k': 'x', 'minute': 7,  'a': 'a1', 'f': None, 'tmode': 'delete', 'dead': True,  'trusted': False},
    {'k': 'x', 'minute': 13, 'a': None, 'f': 'f1', 'tmode': 'delete', 'dead': False, 'trusted': False},
    {'k': 'u', 'minute': 26, 'a': 'a2', 'f': None, 'tmode': 'ignore', 'dead': False, 'trusted': False},
    {'k': 'u', 'minute': 21, 'a': 'a1', 'f': None, 'tmode': 'save1',  'dead': False, 'trusted': False},
    {'k': 'x', 'minute': 29, 'a': 'a1', 'f': None, 'tmode': 'save1',  'dead': True,  'trusted': False},
    {'k': 'x', 'minute': 14, 'a': 'a1', 'f': None, 'tmode': 'save2',  'dead': True,  'trusted': True},
    {'k': 'u', 'minute': 24, 'a': 'a1', 'f': None, 'tmode': 'save1',  'dead': False, 'trusted': False},
    {'k': 'x', 'minute': 10, 'a': None, 'f': None, 'tmode': 'save1',  'dead': True,  'trusted': False},
    {'k': 'u', 'minute': 27, 'a': 'a1', 'f': 'f2', 'tmode': 'save2',  'dead': True,  'trusted': False},
    {'k': 'x', 'minute': 13, 'a': None, 'f': 'f1', 'tmode': 'delete', 'dead': False, 'trusted': False},
    {'k': 'u', 'minute': 19, 'a': None, 'f': None, 'tmode': 'ignore', 'dead': True,  'trusted': False},
    {'k': 'u', 'minute': 2,  'a': 'a2', 'f': 'f1', 'tmode': 'delete', 'dead': False, 'trusted': True},
    {'k': 'x', 'minute': 21, 'a': 'a1', 'f': None, 'tmode': 'delete', 'dead': False, 'trusted': True},
    {'k': 'u', 'minute': 11, 'a': None, 'f': None, 'tmode': 'save1',  'dead': True,  'trusted': False},
    {'k': 'x', 'minute': 6,  'a': 'a1', 'f': 'f2', 'tmode': 'save2',  'dead': True,  'trusted': False},
    {'k': 'u', 'minute': 27, 'a': 'a1', 'f': 'f1', 'tmode': 'save1',  'dead': False, 'trusted': True},
]
SPLIT = [0, 0, 2, 0, 2, 1, 2, 0]

TMAP = {
    "ignore": Row(value=None, status="IGNORE"),
    "save1": Row(value="t1", status="SAVE"),
    "save2": Row(value="t2", status="SAVE"),
    "delete": Row(value=None, status="DELETE"),
}


def build(raw):
    msgs = []
    for i, r in enumerate(raw):
        msgs.append(
            {
                "k": r["k"],
                "valid_from": datetime.datetime(2024, 1, 1, 0, r["minute"], i),
                "seq": i,
                "a": r["a"],
                "f": r["f"],
                "t": TMAP[r["tmode"]],
                "dead": r["dead"] and i % 3 == 0,
                "trusted": r["trusted"],
            }
        )
    return msgs


def check(spark, raw, split, verbose=False):
    from test_merge_differential import (
        TRUSTED_SCHEMA,
        TRUSTED_SPEC,
        model_fold_trusted,
    )
    from emap_spark.operators.merge import merge_batch, merge_batch_versions

    messages = build(raw)
    expected = model_fold_trusted(
        [{**m, "t": None if m["t"] is None else {"value": m["t"].value, "status": m["t"].status}}
         for m in messages]
    )
    batches = [[], [], []]
    for m, b in zip(messages, it.cycle(split)):
        batches[b].append(m)

    def run(merge):
        cur = None
        for bid, b in enumerate(batches):
            if not b:
                continue
            df = spark.createDataFrame([Row(**m) for m in b], TRUSTED_SCHEMA)
            cur = merge(cur, df, TRUSTED_SPEC, f"2024-06-01 00:00:{bid:02d}").current
            cur = cur.localCheckpoint()
        return {
            r.k: (r.a, r.f, r.t, r.valid_from)
            for r in cur.filter(~cur.is_deleted).collect()
        }

    exp = {k: v[:3] for k, v in expected.items()}
    bad = []
    for name, merge in (("mb", merge_batch), ("mbv", merge_batch_versions)):
        got = {k: v[:3] for k, v in run(merge).items()}
        if got != exp:
            bad.append(name)
            if verbose:
                print(f"  {name} MISMATCH:")
                print(f"    expected: {exp}")
                print(f"    got     : {got}")
    return bad


def main():
    spark = get_spark("repro_m6", cpus=8, shuffle_partitions=8)
    bad = check(spark, RAW, SPLIT, verbose=True)
    print("initial mismatch in:", bad or "NONE")
    if not bad:
        return
    raw, split = list(RAW), list(SPLIT)
    # greedy message minimization (repeat until fixpoint)
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(raw):
            cand = raw[:i] + raw[i + 1:]
            if cand and check(spark, cand, split):
                raw = cand
                changed = True
                print(f"dropped msg; {len(raw)} left")
            else:
                i += 1
    print("minimal raw:")
    for r in raw:
        print(" ", r)
    print("split:", split)
    check(spark, raw, split, verbose=True)


if __name__ == "__main__":
    main()
