"""Exact money arithmetic on doubles.

Price-like columns in the testdata carry <=2 decimal places but are stored
as doubles. Summing doubles is order-dependent (Spark's partition order !=
DuckDB's), which would break value-hash parity with the oracle. The fix:
convert to integer minor units (cents) *before* aggregating — integer sums
are exact and associative, so any summation order yields the same result on
both engines. At 100 TB this is also the faster plan: long sums instead of
double sums, no compensated-summation tricks needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Exact 2-dp double -> integer cents. round() kills the ~1e-12 float
    noise in `x*100` before the cast truncates."""
    return F.round(col * 100).cast("long")


def sum_money(col: Column) -> Column:
    """Order-independent exact sum of a 2-dp money column, back to double."""
    return (F.sum(cents(col)) / 100.0)


def avg_money(col: Column) -> Column:
    return F.sum(cents(col)) / F.count(col) / 100.0


# Oracle-side (DuckDB ANSI SQL) equivalents, kept adjacent so the two
# implementations can be eyeballed together.
def sql_cents(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


def sql_sum_money(expr: str) -> str:
    return f"(SUM({sql_cents(expr)}) / 100.0)"


def sql_avg_money(expr: str) -> str:
    return f"(SUM({sql_cents(expr)}) / COUNT({expr}) / 100.0)"
