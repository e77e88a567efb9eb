"""Skew mitigation: salted two-phase aggregation.

A groupBy on a low-cardinality / skewed key sends every row of a hot key
to one reducer. For algebraic aggregates Spark's map-side partial
aggregation usually absorbs this, but when partials can't combine early
(high-cardinality intermediate state, exactish distincts, or a first
shuffle already keyed differently) the fix is salting: aggregate on
(key, salt) first — spreading each hot key over `buckets` reducers —
then re-aggregate the partials on the key alone.

The salt is a deterministic hash of the row (not rand()): results are
reproducible and retry-safe (a re-executed task salts identically).
AQE's skew-join handling covers joins; this covers aggregations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sum_exprs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase sum/count over skewed keys.

    `sum_exprs`: output name → column expression to sum (use integer
    cents for money). Returns one row per key with each sum plus `n`.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__n"),
            *[expr_sum.alias(f"__s_{name}") for name, expr_sum in (
                (n, F.sum(e)) for n, e in sum_exprs.items()
            )],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__s_{name}").alias(name) for name in sum_exprs],
    )
