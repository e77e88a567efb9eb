"""Every registry query must match its DuckDB oracle at the test SF —
the in-repo mirror of the driver's t2 correctness gate, at the same
strictness as scripts/check_parity.py (Arrow dtype level + bit-exact
values), so a regression in a driver-unwatched query cannot land
(VERDICT r2 item 2)."""

from __future__ import annotations

import pytest

from pse_stocks_etl_spark import plans
from pse_stocks_etl_spark.plans import _DRIVER_FIRST
from pse_stocks_etl_spark.testing import duck_connection, strict_compare

from conftest import SF_DIR

NAMES = sorted(plans.REGISTRY)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = plans.REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert sdf.count() >= 0  # rows-only check: plan executes
        return
    problems = strict_compare(sdf.toArrow(), duck.sql(q.oracle).fetch_arrow_table())
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_window_covers_unverified_queries():
    """The driver records the first 50 registry entries; every query
    without a cumulative driver-green row (r1+r2) must sit inside that
    window, former r1 FAILs first (VERDICT r2 item 1)."""
    names = list(plans.REGISTRY)
    window = set(names[:50])
    priority = [n for n in _DRIVER_FIRST if n in plans.REGISTRY]
    # the priority block must lead the registry, in order
    assert names[: len(priority)] == priority
    assert names[:3] == [
        "csv_roundtrip_counts",
        "json_extract_props",
        "approx_distinct_per_key",
    ]
    assert set(priority) <= window, sorted(set(priority) - window)
