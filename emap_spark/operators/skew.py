"""Skew handling (SURVEY §8 round-2 item 5).

Two complementary mechanisms, matching how skew actually bites at
100 TB:

1. JOIN skew — a hot MRN / ward location making one shuffle partition
   huge: handled by AQE's runtime skew-join splitting, which
   emap_spark.session enables (spark.sql.adaptive.skewJoin.enabled);
   asserted in tests/test_physical_plans.py.

2. AGGREGATION skew where partial (map-side) aggregation cannot
   compress — e.g. collect_list / count-distinct per key, where a hot
   key's rows all land on one reducer: salted_agg below splits each
   key into n_salt sub-keys for the first shuffle, then combines the
   per-salt partials with a second, tiny shuffle on the real key. The
   salt is derived from a per-row hash, so the split is even regardless
   of data distribution; correctness needs only that the aggregate be
   two-phase decomposable (sum-of-sums, count via sum, max-of-maxes,
   flatten-of-lists, distinct-of-distincts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (partial aggregate over raw rows, final combiner over per-salt partials)
_TWO_PHASE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "max": (F.max, F.max),
    "min": (F.min, F.min),
    "collect_list": (
        F.collect_list,
        lambda c: F.flatten(F.collect_list(c)),
    ),
    "collect_set": (
        F.collect_set,
        lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
    ),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salt: int = 32,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-shuffle aggregation immune to hot keys.

    aggs: (input_col, how, alias) with how in _TWO_PHASE. The first
    groupBy shuffles on (keys..., salt) — a hot key spreads over n_salt
    reducers; the second shuffles n_salt rows per key. The default salt
    is ROW-UNIQUE (monotonically_increasing_id cycled through n_salt),
    so the spread holds even when a hot key's rows carry constant or
    low-cardinality values — a value-hash salt would funnel those
    through few reducers. Caller-supplied salt_on trades that guarantee
    for content determinism; it must still be well-distributed over the
    hot key's rows to keep the skew immunity.
    """
    if salt_on is None:
        salt_on = F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(salt_on, F.lit(n_salt)))
    partials = []
    finals = []
    for col, how, alias in aggs:
        try:
            partial_fn, final_fn = _TWO_PHASE[how]
        except KeyError:
            raise ValueError(
                f"{how!r} is not two-phase decomposable; supported: "
                f"{sorted(_TWO_PHASE)}"
            ) from None
        partials.append(partial_fn(F.col(col)).alias(alias))
        finals.append(final_fn(F.col(alias)).alias(alias))
    return (
        salted.groupBy(*keys, "__salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )


def salted_count_distinct(
    df: DataFrame, keys: list[str], value: str, n_salt: int = 32
) -> DataFrame:
    """countDistinct per key without funnelling a hot key through one
    reducer: dedupe on (keys, value) salted by the VALUE hash (equal
    values co-locate, so the dedupe is exact), then count."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt))
    )
    per_salt = salted.groupBy(*keys, "__salt").agg(
        F.count_distinct(F.col(value)).alias("__n")
    )
    return per_salt.groupBy(*keys).agg(F.sum("__n").alias(f"n_distinct_{value}"))
