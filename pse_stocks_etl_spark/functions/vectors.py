"""Vector math over array<float> embedding columns — similarity search
primitives.

Built-in higher-order functions only (zip_with / aggregate / transform):
the dot product and norms run JVM-side inside codegen, no UDF, so a
brute-force cosine top-k is a single scan + broadcast of the query
vector. Cosines are rounded to 6 dp before ranking so Spark's
left-to-right `aggregate` fold and the oracle's summation agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, ndigits: int = 6) -> Column:
    c = dot(a, b) / (norm(a) * norm(b))
    return F.round(c, ndigits)


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane.

    `planes` are fixed literal vectors (seeded, shared verbatim with the
    oracle SQL) so the bucketing is deterministic across engines. At
    scale this turns O(N) brute-force search into a bucket-equijoin.
    """
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


# ---- DuckDB oracle twins -------------------------------------------------

def sql_dot(a: str, b: str, dim: int) -> str:
    """Sequential left-to-right dot product (matches Spark's aggregate fold)."""
    terms = " + ".join(f"({a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE)" for i in range(1, dim + 1))
    return f"({terms})"


def sql_cosine(a: str, b: str, dim: int, ndigits: int = 6) -> str:
    d = sql_dot(a, b, dim)
    na = sql_dot(a, a, dim)
    nb = sql_dot(b, b, dim)
    return f"round({d} / (sqrt({na}) * sqrt({nb})), {ndigits})"


# -- compile-footprint-bounded oracle forms --------------------------------
#
# sql_cosine expands to 3 x dim multiply terms PER OCCURRENCE; an oracle
# that inlines it in SELECT + window ORDER BY + WHERE per witness pool
# compiles a parse tree DuckDB's allocator cannot sustain after hundreds
# of large oracle compiles (the docs_semdedup_increment driver OOM,
# CORRECTNESS_r10). The bounded form precomputes each row's norm ONCE in
# a shared CTE (sql_norms_cte) and each pair's cosine ONCE in an inner
# projection (sql_cosine_prenorm), so downstream WHERE/ORDER BY reference
# a plain alias. Arithmetic is bit-identical to sql_cosine:
# round(dot / (sqrt(na) * sqrt(nb)), n) with the two sqrt factors merely
# evaluated per ROW instead of per PAIR. tests/test_oracle_footprint.py
# enforces the expansion budget over every registered oracle.


def sql_norms_cte(
    dim: int,
    name: str = "vnorms",
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """CTE `name(id_col, nrm)`: per-row L2 norm, ONE dot expansion total."""
    d = sql_dot(vec_col, vec_col, dim)
    return f"{name} AS (SELECT {id_col}, sqrt({d}) AS nrm FROM {table})"


def sql_cosine_prenorm(
    a: str, b: str, na: str, nb: str, dim: int, ndigits: int = 6
) -> str:
    """Pair cosine with precomputed per-row norms `na`/`nb` (columns of a
    sql_norms_cte join): ONE dot expansion. Use only as a projection
    alias — reference the alias in WHERE/ORDER BY, never re-inline."""
    d = sql_dot(a, b, dim)
    return f"round({d} / ({na} * {nb}), {ndigits})"
