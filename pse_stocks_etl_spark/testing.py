"""Oracle-parity comparison helpers (shared by tests/ and scripts/).

Mirrors the driver's t2 gate: row count + column-name set +
order-insensitive comparison of normalized cell values, Spark vs a
DuckDB run of the oracle SQL over the same parquet tables.
"""

from __future__ import annotations

import math

import duckdb

from .schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def compare(s_cols, s_rows, d_cols, d_rows) -> list[str]:
    """Return a list of mismatch descriptions; empty == parity."""
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        return [f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"]
    a, b = norm_rows(list(s_cols), s_rows), norm_rows(list(d_cols), d_rows)
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    if diffs:
        problems.append(f"{len(diffs)} differing rows; first: {diffs[:3]}")
    return problems
