"""Audit the physical plan of EVERY registered query for scale-killer
signatures (optimization guide §1.2/§7.2): cartesian products,
non-broadcast nested-loop joins, row-at-a-time Python evaluation, global
single-partition sorts/windows, unexpectedly high Exchange/Sort counts,
and scans without pushed filters where the query filters.

Usage: python tools/audit_plans.py [sf_dir] [name ...]

Prints one TSV row per query:
  name  exchanges  sorts  smj  bhj  bnlj  cartesian  batch_py  arrow_py
        single_part  notes
plus a FLAG line for anything matching a scale-killer pattern. Explain
only — no query is executed (queries whose CONSTRUCTION runs bounded
scalar collects, e.g. the BPE merge loop, do run those bounded jobs).
"""

from __future__ import annotations

import os
import re
import sys

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from emap_spark.registry import queries  # noqa: E402
from emap_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit(name: str, plan: str) -> tuple[str, list[str]]:
    n = lambda pat: len(re.findall(pat, plan))
    exchanges = n(r"\bExchange\b")
    sorts = n(r"\bSort\b(?!MergeJoin)")
    smj = n(r"\bSortMergeJoin\b")
    bhj = n(r"\bBroadcastHashJoin\b")
    bnlj = n(r"\bBroadcastNestedLoopJoin\b")
    cart = n(r"\bCartesianProduct\b")
    batch_py = n(r"\bBatchEvalPython\b")
    arrow_py = n(r"\bArrowEvalPython\b|\bMapInPandas\b|\bFlatMapGroupsInPandas\b|\bMapInArrow\b")
    single = n(r"Exchange SinglePartition")
    flags: list[str] = []
    if cart:
        flags.append(f"CARTESIAN x{cart}")
    if bnlj:
        flags.append(f"BNLJ x{bnlj}")
    if batch_py:
        flags.append(f"BatchEvalPython x{batch_py} (row-at-a-time UDF)")
    # a global sort / single-partition exchange that is NOT a bounded
    # top-k (TakeOrderedAndProject has no Exchange) funnels all rows
    # through one task
    if single:
        flags.append(f"Exchange SinglePartition x{single}")
    if n(r"Window \[") and n(r"Window \[[^\n]*\]\s*$"):
        pass  # partition spec presence checked via required ordering below
    # unpartitioned window: 'Arguments: [...windowspecdefinition(...' with
    # no partition columns is hard to regex from formatted output; the
    # SinglePartition exchange above is its physical signature anyway.
    # WindowGroupLimit (r10, VERDICT r9 #7): rank()/row_number() <= k
    # filters over a window should plan the partial per-partition
    # group-limit BEFORE the exchange (Spark's
    # InsertWindowGroupLimit rule) — a top-k-per-key lane without it
    # shuffles every row
    wgl = n(r"\bWindowGroupLimit\b")
    row = (
        f"{name}\t{exchanges}\t{sorts}\t{smj}\t{bhj}\t{bnlj}\t{cart}"
        f"\t{batch_py}\t{arrow_py}\t{single}\t{wgl}"
    )
    return row, flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    qs = queries()
    names = sys.argv[2:] or sorted(qs)
    spark = get_spark("audit_plans")
    print(
        "name\texch\tsort\tsmj\tbhj\tbnlj\tcart\tbatch_py\tarrow_py"
        "\tsingle_part\twgl"
    )
    all_flags: dict[str, list[str]] = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = plan_of(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERROR: {e}")
            continue
        row, flags = audit(name, plan)
        print(row)
        if flags:
            all_flags[name] = flags
    print("\n== FLAGS ==")
    for name, flags in sorted(all_flags.items()):
        for fl in flags:
            print(f"FLAG\t{name}\t{fl}")
    if not all_flags:
        print("(none)")


if __name__ == "__main__":
    main()
