"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column set, and values
(order-insensitive, exact after the queries' own rounding).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emap_spark.registry import specs  # noqa: E402
from emap_spark.session import get_spark  # noqa: E402
from emap_spark.sources.tables import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # Stable order-insensitive compare: sort by the string form of each row.
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the family the driver's typed hash
    distinguishes.  int64 vs float64 drift (the r6 q111 / r7 q118
    HUGEINT bug class) must fail even when values compare equal."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "m":
        return "timedelta"
    return "object"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    # Dtype-parity gate: the driver hashes values THROUGH the pandas
    # dtype, so an oracle column that lands in a different dtype family
    # (e.g. DuckDB HUGEINT -> float64 vs Spark BIGINT -> int64)
    # hash-mismatches at the driver even when every value is equal.
    for col in sdf.columns:
        sk, ok = _dtype_kind(sdf[col].dtype), _dtype_kind(odf[col].dtype)
        if sk != ok:
            problems.append(
                f"col {col}: DTYPE DRIFT spark={sdf[col].dtype} ({sk}) "
                f"oracle={odf[col].dtype} ({ok}) — cast the oracle "
                f"(::BIGINT / ::DOUBLE) or the Spark side to agree"
            )
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for col in s.columns:
        sc, oc = s[col], o[col]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(oc):
            sc_f = pd.to_numeric(sc, errors="coerce")
            oc_f = pd.to_numeric(oc, errors="coerce")
            bad = ~((sc_f.isna() & oc_f.isna()) | (sc_f == oc_f))
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"col {col}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={sc_f[i]!r} oracle={oc_f[i]!r}"
                )
        else:
            bad = ~((sc.isna() & oc.isna()) | (sc.astype(str) == oc.astype(str)))
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"col {col}: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={sc[i]!r} oracle={oc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    con = duck_con(sf_dir)
    all_specs = specs()
    failed, no_oracle = [], []
    n_checked = 0
    for name, spec in sorted(all_specs.items()):
        if only and name not in only:
            continue
        n_checked += 1
        sdf = spec.fn(spark, sf_dir).toPandas()
        if spec.oracle is None:
            no_oracle.append(name)
            print(f"  (rows-only) {name}: {len(sdf)} rows")
            continue
        odf = con.execute(spec.oracle).df()
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(sdf)} rows")
    print(f"\n{n_checked - len(failed) - len(no_oracle)} ok, "
          f"{len(failed)} failed, {len(no_oracle)} rows-only "
          f"({n_checked}/{len(all_specs)} checked)")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
