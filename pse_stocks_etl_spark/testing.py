"""Oracle-parity comparison helpers (shared by tests/ and scripts/).

Mirrors the driver's t2 gate: row count + column-name set +
order-insensitive comparison of normalized cell values, Spark vs a
DuckDB run of the oracle SQL over the same parquet tables.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa

from .schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    # DuckDB's default memory_limit is ~80% of PHYSICAL RAM, which
    # over-commits when a Spark JVM holds tens of GB alongside it —
    # under full-suite pressure that surfaced as a spurious
    # "Failed to allocate block of 32768 bytes" on oracles that pass
    # in isolation. A modest cap + a spill directory makes heavy
    # oracles degrade to disk instead of bad-alloc.
    import tempfile

    con.sql("SET memory_limit = '4GB'")
    # Thread cap matters as much as the byte cap: DuckDB reserves
    # operator memory PER THREAD, so a many-operator plan (the
    # composed SemDeDup/consensus oracles have dozens of pipeline
    # stages) on a 32-core box with ~90 worker threads exhausts a 4GB
    # limit on kilobytes of actual data — observed as
    # "Failed to allocate block of 16384 bytes" right after a prior
    # heavy oracle on the same connection. Oracle inputs are sf<=0.01;
    # 8 threads is plenty.
    con.sql("SET threads = 8")
    con.sql(f"SET temp_directory = '{tempfile.mkdtemp(prefix='duck_spill_')}'")
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


# ---------------------------------------------------------------------------
# Strict (driver-grade) Arrow-level comparison. DuckDB widens integer SUM
# to HUGEINT, which its Arrow export surfaces as decimal128(38,0) while
# Spark emits int64; the driver's value hasher canonicalizes those
# differently even when every value is numerically equal, so the local
# gate must fail on any such divergence. Floats compare at full
# round-trip precision (repr), not %.9g.
# ---------------------------------------------------------------------------


def canon_dtype(t: pa.DataType) -> str:
    """Canonical cross-engine dtype label (int widths collapse; decimal
    stays distinct from int64/float64 so HUGEINT leaks are caught)."""
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


def strict_norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip form: bit-exact comparison
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(strict_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{strict_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def arrow_summary(tbl: pa.Table):
    """(sorted col names, {col: canon dtype}, sorted normalized rows)."""
    cols = sorted(tbl.column_names)
    dtypes = {name: canon_dtype(tbl.schema.field(name).type) for name in tbl.column_names}
    pydata = {name: tbl.column(name).to_pylist() for name in cols}
    rows = sorted(
        tuple(strict_norm_cell(pydata[c][i]) for c in cols) for i in range(tbl.num_rows)
    )
    return cols, dtypes, rows


def compare_overlapped(sdf, con, oracle: str) -> list[str]:
    """compare(), with the Spark side and the DuckDB oracle executed
    CONCURRENTLY on two threads (guide §2.6 applied to the parity
    harness itself: the engines are independent, so each check costs
    max(spark, duck) instead of the sum — the IVF/corpus oracles spend
    multiple seconds on BOTH sides). `sdf` may be the DataFrame or a
    zero-arg thunk returning it — pass a thunk when building the frame
    itself runs jobs (checkpoint-materializing compositions), so that
    work overlaps the oracle too. Spark runs on the worker thread
    (py4j releases the GIL on socket waits); the single shared DuckDB
    connection stays on the caller's thread — _RecyclingDuck and raw
    connections are single-caller objects."""
    from concurrent.futures import ThreadPoolExecutor

    def spark_side():
        df = sdf() if callable(sdf) else sdf
        return df.columns, [tuple(r) for r in df.collect()]

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(spark_side)
        rel = con.sql(oracle)
        d_cols, d_rows = rel.columns, rel.fetchall()
        s_cols, s_rows = fut.result()
    return compare(s_cols, s_rows, d_cols, d_rows)


def strict_compare_overlapped(sdf, con, oracle: str) -> list[str]:
    """strict_compare() with the same two-engine overlap (and the same
    DataFrame-or-thunk contract) as compare_overlapped."""
    from concurrent.futures import ThreadPoolExecutor

    def spark_side():
        df = sdf() if callable(sdf) else sdf
        return df.toArrow()

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(spark_side)
        d_tbl = con.sql(oracle).fetch_arrow_table()
        s_tbl = fut.result()
    return strict_compare(s_tbl, d_tbl)


def strict_compare(s_tbl: pa.Table, d_tbl: pa.Table) -> list[str]:
    """Driver-grade parity: column names + canonical dtypes + bit-exact
    sorted values. Empty list == parity."""
    s_cols, s_dtypes, s_rows = arrow_summary(s_tbl)
    d_cols, d_dtypes, d_rows = arrow_summary(d_tbl)
    if s_cols != d_cols:
        return [f"columns differ: spark={s_cols} duck={d_cols}"]
    bad_dtypes = {c: (s_dtypes[c], d_dtypes[c]) for c in s_cols if s_dtypes[c] != d_dtypes[c]}
    if bad_dtypes:
        return [f"dtype mismatch (spark, duck): {bad_dtypes}"]
    problems: list[str] = []
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    diffs = [(x, y) for x, y in zip(s_rows, d_rows) if x != y]
    if diffs:
        problems.append(f"{len(diffs)} differing rows; first: {diffs[:3]}")
    return problems


# Queries that once had a registry entry (and therefore hold driver rows
# in old CORRECTNESS_r*.json files) but were deliberately DEMOTED to
# non-registry helpers. The cumulative ledger join (driver history vs
# the live registry) treats these as resolved, not rot; the doc-drift
# guard asserts the sets match exactly so an accidental deregistration
# cannot hide behind this list.
DEMOTED_QUERIES: dict[str, str] = {
    "docs_containment_pairs": (
        "demoted r10 to helper containment_pairs_capped "
        "(round8_queries.py); lossless successor registry query: "
        "docs_containment_prefix_pairs"
    ),
}


def driver_history(repo_root: str, max_round: int | None = None) -> dict[str, str]:
    """Per-query driver-verification history from CORRECTNESS_r*.json:
    ``name -> "r1 green, r2 FAIL, r3 rows-only, ..."``.

    One classification rule, shared by COVERAGE.md's generated driver
    map (scripts/gen_driver_map.py) and the doc-drift guard
    (tests/test_docs_contract.py) so prose about driver rounds can
    never drift from the recorded files again (r5 VERDICT item 2):
    ``err == 'no_oracle'`` with rows observed = rows-only;
    ``hash_match is True`` = green; anything else = FAIL.

    ``max_round`` restricts to files of that round or older — the doc
    guard uses it to separate "a newer CORRECTNESS file landed after
    the map was committed" (expected between rounds; regenerating is
    the next round's first move) from genuine map rot.
    """
    import glob
    import json
    import os
    import re

    hist: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if max_round is not None and int(m.group(1)) > max_round:
            continue
        rnd = f"r{m.group(1)}"
        for name, rec in json.load(open(path)).items():
            if rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None:
                status = "rows-only"
            elif rec.get("hash_match") is True:
                status = "green"
            else:
                status = "FAIL"
            hist.setdefault(name, []).append(f"{rnd} {status}")
    return {name: ", ".join(v) for name, v in hist.items()}


def latest_driver_round(repo_root: str) -> int:
    """Highest round number with a CORRECTNESS_r*.json on disk (0 if
    none)."""
    import glob
    import os
    import re

    rounds = [
        int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
    ]
    return max(rounds, default=0)
