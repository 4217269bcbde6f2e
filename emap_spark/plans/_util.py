"""Shared helpers for oracle-checked query plans.

Cross-engine determinism: float aggregation order differs between Spark
and DuckDB, so any order-sensitive double SUM/AVG can drift in the last
ulp and break the driver's value-hash. We aggregate through DECIMAL
(exact, order-insensitive), cast the final value to DOUBLE, and round.
Both engines perform identical correctly-rounded casts, so results are
bit-identical. Timestamps are exposed as epoch-microsecond BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Wide enough for TPC-H money columns (< 1e7) with 4-decimal inputs, and
# narrow enough that 3-way decimal products stay inside precision 38.
DEC = "decimal(12,4)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive SUM: decimal-sum -> double -> round."""
    return F.round(F.sum(dec(col)).cast("double"), scale)


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive AVG with deterministic double division."""
    return F.round(F.sum(dec(col)).cast("double") / F.count(F.lit(1)), scale)


def us(col: Column | str) -> Column:
    """Timestamp -> epoch microseconds (matches DuckDB epoch_us).

    Parquet naive timestamps arrive as TIMESTAMP_NTZ; with the session in
    UTC the cast makes unix_micros agree with DuckDB's epoch_us.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def tlit(s: str) -> Column:
    """Literal comparable to a parquet TIMESTAMP_NTZ column without
    forcing a cast onto the column (keeps predicate pushdown)."""
    return F.lit(s).cast("timestamp_ntz")


# SQL-side mirrors (DuckDB dialect), kept next to the Spark helpers so the
# two stay in sync.
def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"round(sum(({expr})::DECIMAL(12,4))::DOUBLE, {scale})"


def sql_davg(expr: str, scale: int = 4) -> str:
    return f"round(sum(({expr})::DECIMAL(12,4))::DOUBLE / count(*), {scale})"
