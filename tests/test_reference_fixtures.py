"""Reference-shaped golden fixtures (FIXTURES.md §1-§3): the exact
schemas and golden values the reference's own integration tests assert
(tests/integration/test_pse_edge.py:37-47,60-75), driven through the
engine's dedup → freshness-merge pipeline."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pse_stocks_etl_spark.operators.dedup import argmax_dedup
from pse_stocks_etl_spark.schemas import COMPANY_SCHEMA, DAILY_STOCK_PRICE_SCHEMA
from pse_stocks_etl_spark.store.parquet_table import ParquetTable

RUN_TS = dt.datetime(2024, 1, 2, 0, 0, 0)

# Golden dimension row (reference test_pse_edge.py:38-46).
JFC = ("JFC", "Jollibee Foods Corporation", "Industrial",
       "Food, Beverage & Tobacco", dt.date(1993, 7, 14), RUN_TS)

# Golden fact row (reference test_pse_edge.py:60-71).
JFC_PRICE = ("JFC", dt.date(2022, 3, 1), 241.4, 245.0, 240.0, 240.0, RUN_TS)


def test_company_schema_and_golden_row(spark):
    df = spark.createDataFrame([JFC], COMPANY_SCHEMA)
    assert [f.name for f in df.schema.fields] == [
        "symbol", "company_name", "sector", "subsector", "listing_date", "extracted_at",
    ]
    row = df.first()
    assert row.symbol == "JFC" and row.listing_date == dt.date(1993, 7, 14)


def test_price_pipeline_keeps_golden_row_through_dedup_and_merge(spark, tmp_path):
    """The reference's A2 dedup keeps the max-close row per (symbol,
    date) (pse_edge.py:259); the K3 merge keeps the fresher extract. The
    golden JFC row must survive both."""
    dup_lower_close = ("JFC", dt.date(2022, 3, 1), 241.0, 244.0, 239.0, 239.5, RUN_TS)
    batch = spark.createDataFrame(
        [JFC_PRICE, dup_lower_close], DAILY_STOCK_PRICE_SCHEMA
    )
    deduped = argmax_dedup(batch, ["symbol", "date"], "close", tiebreak=["extracted_at"])
    assert deduped.count() == 1
    assert deduped.first().close == 240.0  # max close wins (golden row)

    table = ParquetTable(
        spark, str(tmp_path / "dsp"), DAILY_STOCK_PRICE_SCHEMA, partition_by=("date",)
    )
    table.init_empty()
    table.merge(
        batch,
        keys=("symbol", "date"),
        freshness_col="extracted_at",
        dedup_order=[F.col("close").desc(), F.col("extracted_at").desc()],
    )
    # stale re-extract with different numbers must NOT clobber
    stale = spark.createDataFrame(
        [("JFC", dt.date(2022, 3, 1), 1.0, 1.0, 1.0, 1.0,
          RUN_TS - dt.timedelta(days=1))],
        DAILY_STOCK_PRICE_SCHEMA,
    )
    table.merge(stale, keys=("symbol", "date"), freshness_col="extracted_at")
    row = table.read().first()
    assert (row.open, row.high, row.low, row.close) == (241.4, 245.0, 240.0, 240.0)
