"""Every registry query must match its DuckDB oracle at the test SF —
the in-repo mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from pse_stocks_etl_spark import plans
from pse_stocks_etl_spark.testing import compare, duck_connection

from conftest import SF_DIR

NAMES = sorted(plans.REGISTRY)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = plans.REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert s_rows is not None  # rows-only check: plan executes
        return
    rel = duck.sql(q.oracle)
    problems = compare(sdf.columns, s_rows, rel.columns, rel.fetchall())
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
