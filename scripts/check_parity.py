"""Dev harness: run every registry query on Spark AND its DuckDB oracle,
compare row count / column names / canonical dtypes / exact sorted values.
Mirrors the driver's correctness gate so regressions surface before a
round ends.

Strictness (round-2 hardening, VERDICT.md item 2): both results are
fetched as Arrow tables and compared at the *dtype* level — DuckDB
widens integer SUM to HUGEINT, which its Arrow export surfaces as
decimal128(38,0) while Spark emits int64; the driver's value hasher
canonicalizes those differently even when every value is numerically
equal, so this check must fail locally on any such divergence. Floats
compare at full round-trip precision (repr), not %.9g — the engine's
money/percentile arithmetic is integer-cents-exact on both sides, so a
bit-level float mismatch is a real bug, not noise.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

from pse_stocks_etl_spark import plans  # noqa: E402
from pse_stocks_etl_spark.schemas import TESTDATA_TABLES  # noqa: E402
from pse_stocks_etl_spark.session import get_spark  # noqa: E402


def canon_dtype(t: pa.DataType) -> str:
    """Canonical cross-engine dtype label.

    Integer widths collapse (Spark int vs DuckDB BIGINT both count as
    int64 — the driver's schema gate passed on those in round 1), but
    decimal stays distinct from int64/float64: DuckDB HUGEINT arrives
    as decimal128(38,0) and MUST fail against Spark's int64.
    """
    if pa.types.is_integer(t):
        return "int64"
    if pa.types.is_floating(t):
        return "float64"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz is None else f"timestamp[tz={t.tz}]"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_dtype(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{canon_dtype(t.field(i).type)}" for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr = shortest round-trip form: bit-exact comparison
        # (distinguishes 0.1 from 0.1+1ulp, -0.0 from 0.0) — strictly
        # tighter than any reasonable driver canonicalization.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_summary(tbl: pa.Table):
    """(sorted col names, {col: canon dtype}, sorted normalized rows)."""
    cols = sorted(tbl.column_names)
    dtypes = {
        name: canon_dtype(tbl.schema.field(name).type) for name in tbl.column_names
    }
    pydata = {name: tbl.column(name).to_pylist() for name in cols}
    n = tbl.num_rows
    rows = sorted(tuple(norm_cell(pydata[c][i]) for c in cols) for i in range(n))
    return cols, dtypes, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name, q in plans.REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            s_tbl = sdf.toArrow()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({s_tbl.num_rows} rows)")
            continue
        try:
            d_tbl = con.sql(q.oracle).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s_cols, s_dtypes, s_rows = table_summary(s_tbl)
        d_cols, d_dtypes, d_rows = table_summary(d_tbl)
        if s_cols != d_cols:
            failures.append(name)
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            continue
        bad_dtypes = {
            c: (s_dtypes[c], d_dtypes[c])
            for c in s_cols
            if s_dtypes[c] != d_dtypes[c]
        }
        if bad_dtypes:
            failures.append(name)
            print(f"FAIL {name}: dtype mismatch (spark, duck): {bad_dtypes}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            continue
        if s_rows != d_rows:
            failures.append(name)
            bad = [(x, y) for x, y in zip(s_rows, d_rows) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            continue
        print(f"ok   {name}: {len(s_rows)} rows match")
    print(f"\n{len(plans.REGISTRY) - len(failures)}/{len(plans.REGISTRY)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
