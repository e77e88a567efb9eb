from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pse_stocks_etl_spark.session import get_spark

    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def capped_duck():
    """DuckDB connection with the same memory cap + spill directory as
    testing.duck_connection: the default memory_limit (~80% of physical
    RAM) over-commits next to the resident Spark JVM, and under
    full-suite pressure long-lived matrix connections died with a
    spurious tiny-block bad-alloc on oracles that pass in isolation
    (observed on the shuffled matrix's emb_semdedup and the
    NULL-events matrix's compressed_io run; same class as the
    round-10 allocator poisoning). Matrix fixtures register their own
    views, so this only standardizes the resource settings."""
    import tempfile

    import duckdb

    con = duckdb.connect()
    con.sql("SET memory_limit = '4GB'")
    con.sql(f"SET temp_directory = '{tempfile.mkdtemp(prefix='duck_spill_')}'")
    return con
