"""Incremental sync engine end-to-end (SURVEY.md §7 M4): watermark →
window → distributed fetch → dedup → freshness merge, with the
reference's exact date semantics and replay idempotency."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pse_stocks_etl_spark.plans.sync import PseDatasets
from pse_stocks_etl_spark.sources.pse_edge import FakePseEdge


@pytest.fixture
def ds(spark, tmp_path):
    d = PseDatasets(spark, str(tmp_path / "pse"))
    d.initdb()
    return d


def test_initdb_creates_empty_tables(ds):
    assert ds.company.read().count() == 0
    assert ds.prices.read().count() == 0


def test_company_sync_overwrites(ds):
    n = ds.sync_companies()
    assert n == len(ds.connector.symbols)
    assert ds.company.read().count() == n
    # re-sync stays stable (K1 overwrite)
    ds.sync_companies()
    assert ds.company.read().count() == n


def test_price_sync_fetches_window_and_is_idempotent(ds):
    r1 = ds.sync(today="2024-01-20", lookback_days=0)
    assert r1["price_rows"] > 0
    v1 = sorted(map(tuple, ds.prices.read().collect()))
    # replay: same horizon → no new trading days, table unchanged
    r2 = ds.sync(today="2024-01-20", lookback_days=0)
    assert sorted(map(tuple, ds.prices.read().collect())) == v1
    # advance the horizon → only the delta is appended
    ds.sync(today="2024-01-25", lookback_days=0)
    v2 = ds.prices.read()
    assert v2.count() > len(v1)
    # watermark advanced to the new horizon - freshness(1d), a weekday-capped date
    max_date = v2.agg(F.max("date")).collect()[0][0]
    assert max_date == dt.date(2024, 1, 24)


def test_watermark_plan_prunes_uptodate_symbols(ds):
    ds.sync(today="2024-01-20", lookback_days=0)
    plan = ds.price_fetch_plan(lookback_days=0, today="2024-01-20")
    assert plan.count() == 0  # P7: everyone up to date
    plan2 = ds.price_fetch_plan(lookback_days=0, today="2024-01-22")
    assert plan2.count() == len(ds.connector.symbols)


def test_lookback_refetches_trailing_window(ds):
    ds.sync(today="2024-01-20", lookback_days=0)
    plan = ds.price_fetch_plan(lookback_days=5, today="2024-01-20")
    rows = plan.collect()
    assert len(rows) == len(ds.connector.symbols)  # lookback forces re-fetch (T2)
    wm = dt.date(2024, 1, 19)  # today - freshness = last fetched trading day... watermark
    for r in rows:
        assert r.target_start == r.watermark + dt.timedelta(days=1 - 5)


def test_freshness_guard_preserves_newer_rows_on_replay(ds, spark):
    ds.sync(today="2024-01-20", lookback_days=0)
    # a second connector with an OLDER extract timestamp and different prices
    ds.connector = FakePseEdge(extracted_at="2023-12-31 00:00:00")
    before = sorted(map(tuple, ds.prices.read().collect()))
    ds.sync_prices(lookback_days=5, today="2024-01-20")
    after = sorted(map(tuple, ds.prices.read().collect()))
    assert after == before  # K3: stale re-extract cannot clobber newer rows


def test_backfill_bounded_by_history_start(ds):
    r = ds.backfill(today="2024-01-10")
    got = ds.prices.read()
    assert r["price_rows"] == got.count()
    min_date = got.agg(F.min("date")).collect()[0][0]
    assert min_date >= ds.connector.history_start


def test_datasource_scan_partitions_per_symbol(spark):
    """The custom DataSource plans one input partition per symbol —
    the catalog-level form of the reference's per-symbol fan-out."""
    from pse_stocks_etl_spark.sources import pse_datasource

    pse_datasource.register(spark)
    df = (
        spark.read.format("pse_edge_fake")
        .option("symbols", "JFC,SM,ALI")
        .option("start", "2024-01-01")
        .option("end", "2024-01-12")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert {r.symbol for r in rows} == {"JFC", "SM", "ALI"}
    # 10 weekdays in Jan 1-12 2024, deterministic across runs
    assert len(rows) == 3 * 10
    again = (
        spark.read.format("pse_edge_fake")
        .option("symbols", "JFC,SM,ALI")
        .option("start", "2024-01-01")
        .option("end", "2024-01-12")
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_sync_observes_batch_metrics(spark, tmp_path):
    """The Observation metrics ride the count() action and must agree
    with the fetched batch's actual stats."""
    from pse_stocks_etl_spark.plans.sync import PseDatasets

    ds = PseDatasets(spark, str(tmp_path / "obs"))
    ds.initdb()
    out = ds.sync(today="2024-01-20")
    m = ds.last_batch_metrics
    assert m["rows"] == out["price_rows"] > 0
    facts = ds.prices.read()
    import datetime as dt

    assert m["min_date"] == dt.date(2024, 1, 1)
    assert m["max_date"] == facts.agg(F.max("date")).first()[0]
    assert m["approx_symbols"] > 0
