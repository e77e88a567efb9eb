"""Extension-operator properties not covered by the oracle harness."""

from __future__ import annotations

from pse_stocks_etl_spark import plans


def test_approx_distinct_close_to_exact(spark, sf_dir):
    exact = {
        r.suppkey: (r.n_parts, r.n_orders)
        for r in plans.REGISTRY["distinct_count_per_key"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.suppkey: (r.approx_parts, r.approx_orders)
        for r in plans.REGISTRY["approx_distinct_per_key"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, (p, o) in exact.items():
        ap, ao = approx[k]
        assert abs(ap - p) <= max(3, 0.1 * p)  # rsd=2% sketch, generous bound
        assert abs(ao - o) <= max(3, 0.1 * o)


def test_asof_attribution_clicks_precede_purchases(spark, sf_dir):
    rows = plans.REGISTRY["asof_click_attribution"].fn(spark, sf_dir).collect()
    assert rows
    matched = [r for r in rows if r.click_ts is not None]
    assert matched, "expected at least one attributed purchase"
    assert all(r.click_ts <= r.ts for r in matched)
