"""Table profiling: per-column quality stats in ONE pass (the
Deequ/ANALYZE-TABLE-shaped operator a pipeline runs before trusting a
new data drop).

Scale notes: the whole profile is a single aggregation over the table —
one scan, map-side-combinable everywhere. The only expand pressure is
exact `countDistinct` per column (Catalyst rewrites N distinct aggs
into an N-way expand of the input); at 100 TB pass
`exact_distinct=False` to swap in `approx_count_distinct` (HLL++,
mergeable, no expand) — the registry query keeps the exact form because
its oracle hash-checks the counts.

Min/max are reported as canonical STRING `repr`s chosen per type to be
bit-identical across engines: integers and strings verbatim, doubles as
integer cents (printf-style formatting differs between Java and C
rounding modes), timestamps as epoch-microseconds computed with
timezone-free NTZ arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _repr_col(name: str, dtype: str) -> Column:
    if dtype == "double":
        return F.expr(f"CAST(CAST(round(`{name}` * 100) AS BIGINT) AS STRING)")
    if dtype.startswith("timestamp"):
        return F.expr(
            f"CAST(timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{name}`) AS STRING)"
        )
    return F.col(name).cast("string")


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-pass profile: (column_name, n_rows, n_nulls, n_distinct,
    min_repr, max_repr) — one output row per profiled column."""
    cols = list(columns) if columns is not None else df.columns
    dtypes = dict(df.dtypes)
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            # count(when(...)) not sum(cast): SUM over an EMPTY table is
            # NULL where the oracle's COUNT(*) - COUNT(col) is 0 — the
            # empty-input matrix pins the zero on both engines
            F.count(F.when(F.isnull(c), 1)).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    pieces = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            _repr_col(f"__mn_{c}", dtypes[c]).alias("min_repr"),
            _repr_col(f"__mx_{c}", dtypes[c]).alias("max_repr"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*pieces)).alias("p")).select("p.*")
