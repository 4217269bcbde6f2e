"""Isolated A/B of the router expression cache (VERDICT r9 #4).

Measures the pure driver cost of building the three ADT routers'
expression trees (the py4j round trips + Column construction that
_cached_exprs memoizes) vs serving them from the gateway cache.
No Spark job runs — this is plan-construction time only, the same
quantity the r9h §9 gap profile attributed 25–141 ms/table/batch to.

Usage: python tools/ab_router_cache.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from emap_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("ab_router_cache")
    from emap_spark import app

    df = spark.range(1)
    builders = {
        "mrn": app._build_mrn_exprs,
        "demographic": app._build_demographic_exprs,
        "visit": app._build_visit_exprs,
    }
    # warm both paths once (JIT/py4j connection)
    for name, b in builders.items():
        b()
        app._cached_exprs(name, df, b)

    fresh = {k: [] for k in builders}
    cached = {k: [] for k in builders}
    for _ in range(n):
        for name, b in builders.items():
            t0 = time.perf_counter()
            b()  # the per-batch rebuild the cache eliminates
            fresh[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            app._cached_exprs(name, df, b)
            cached[name].append(time.perf_counter() - t0)

    for name in builders:
        f, c = sorted(fresh[name]), sorted(cached[name])
        med = lambda xs: xs[len(xs) // 2]
        print(
            f"{name:12s} fresh build min/med {f[0]*1000:7.2f}/{med(f)*1000:7.2f} ms"
            f"   cached {c[0]*1e6:6.1f}/{med(c)*1e6:6.1f} us"
        )
    tot_f = sum(sorted(fresh[n_])[len(fresh[n_]) // 2] for n_ in builders)
    print(f"per-batch driver cost eliminated (3 tables, medians): {tot_f*1000:.1f} ms")


if __name__ == "__main__":
    main()
