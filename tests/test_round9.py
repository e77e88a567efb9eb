"""Round-9 staged queries: strict DuckDB parity (same gate as
tests/test_parity.py — Arrow dtype level, bit-exact values) plus the
staging-drain guard that keeps plans/staging.py a queue, not a
parking lot."""

from __future__ import annotations

import pytest

from pse_stocks_etl_spark import plans
from pse_stocks_etl_spark.plans.staging import STAGING
from pse_stocks_etl_spark.testing import duck_connection, strict_compare

from conftest import SF_DIR

# Importing the module populates STAGING.
from pse_stocks_etl_spark.plans import round9_queries  # noqa: F401

NAMES = sorted(STAGING)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", NAMES)
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    q = STAGING[name]
    sdf = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert sdf.count() >= 0
        return
    problems = strict_compare(sdf.toArrow(), duck.sql(q.oracle).fetch_arrow_table())
    assert not problems, f"{name}: {problems}"


def test_staged_names_disjoint_from_registry():
    clash = sorted(set(STAGING) & set(plans.REGISTRY))
    assert not clash, f"staged names shadow registered queries: {clash}"


def test_staging_drains_when_backlog_has_room():
    """Staging exists ONLY because the driver-verification backlog is at
    its 25-query bound. Once CORRECTNESS files show the queue drained
    (backlog below the bound), staged queries MUST be promoted to
    REGISTRY — this test turns red to force it."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hash_green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(path)).items():
            if rec.get("hash_match") is True:
                hash_green.add(name)
    names = list(plans.REGISTRY)
    window = set(names[:50])
    backlog = len(set(names) - hash_green - window)
    room = 25 - backlog
    assert len(STAGING) == 0 or room < len(STAGING), (
        f"driver backlog has room for {room} more unverified queries but "
        f"{len(STAGING)} sit in staging — promote them to REGISTRY and "
        "append to _DRIVER_FIRST (see plans/staging.py)"
    )
