"""Hermetic S1–S3 extraction tests: the pure parsers run against
recorded-shape HTML/JSON fixtures and must reproduce the reference's
own golden integration values (reference tests/integration/
test_pse_edge.py:37-47 JFC ids + metadata, :60-75 2022-03-01 OHLC).
No network, no Spark session needed."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pse_stocks_etl_spark.sources.pse_edge_parse import (
    COMPANY_COLUMNS,
    PRICE_COLUMNS,
    filter_autocomplete,
    normalize_companies,
    parse_chart_data,
    parse_company_info_page,
    parse_directory_page,
    trim_to_window,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "pse_edge")


def _read(name: str) -> str:
    with open(os.path.join(FIX, name)) as f:
        return f.read()


def test_directory_page_rows_and_pager():
    rows, page_count = parse_directory_page(_read("company_search_page1.html"))
    assert page_count == 2  # pager max from numeric href="#" anchors
    assert [r["symbol"] for r in rows] == ["JFC", "SM"]
    jfc = rows[0]
    assert jfc["company_name"] == "Jollibee Foods Corporation"
    assert jfc["sector"] == "Industrial"
    assert jfc["subsector"] == "Food, Beverage & Tobacco"  # entity decoded
    assert jfc["listing_date"] == "Jul 14, 1993"


def test_directory_pagination_concat_and_normalize():
    rows1, n = parse_directory_page(_read("company_search_page1.html"))
    rows2, _ = parse_directory_page(_read("company_search_page2.html"))
    assert n == 2
    df = normalize_companies(rows1 + rows2, "Tue, 01 Mar 2022 12:00:00 GMT")
    assert df.columns.tolist() == COMPANY_COLUMNS
    assert df["symbol"].tolist() == ["JFC", "SM", "ALI"]
    assert df.loc[0, "listing_date"] == dt.date(1993, 7, 14)  # golden
    assert df.loc[0, "extracted_at"] == dt.datetime(2022, 3, 1, 12, 0, 0)
    # no-match edge: zero rows still yields the full column contract
    assert normalize_companies([], "").columns.tolist() == COMPANY_COLUMNS


def test_autocomplete_exact_match_filter():
    js = _read("autocomplete_jfc.json")
    hit = filter_autocomplete(js, "JFC")
    assert hit == {"company_id": "86", "company_name": "Jollibee Foods Corporation"}
    # fuzzy lookalike (symbol JFCX) must NOT match; unknown returns None
    assert filter_autocomplete(js, "JFCX")["company_id"] == "9001"
    assert filter_autocomplete(js, "NOPE") is None


def test_company_info_page_golden_values():
    info = parse_company_info_page(
        _read("company_info_jfc.html"),
        "JFC",
        "Jollibee Foods Corporation",
        "86",
    )
    # the reference's exact golden dict (test_pse_edge.py:37-47)
    assert info == {
        "symbol": "JFC",
        "company_name": "Jollibee Foods Corporation",
        "company_id": "86",
        "security_id": "158",
        "sector": "Industrial",
        "subsector": "Food, Beverage & Tobacco",
        "listing_date": "1993-07-14",
    }


def test_chart_data_golden_row_and_max_close_dedup():
    df = parse_chart_data(
        _read("chart_data_jfc.json"), "JFC", "Tue, 01 Mar 2022 16:00:00 GMT"
    )
    assert df.columns.tolist() == PRICE_COLUMNS
    # duplicate CHART_DATE rows: the max-close row wins (reference :259)
    assert len(df) == 2
    r = df[df["date"] == dt.date(2022, 3, 1)].iloc[0]
    # the reference's exact golden OHLC (test_pse_edge.py:60-71)
    assert (r["open"], r["high"], r["low"], r["close"]) == (241.4, 245.0, 240.0, 240.0)
    assert r["symbol"] == "JFC"
    assert df["open"].dtype == "float64" and df["close"].dtype == "float64"


def test_chart_data_empty_short_circuit():
    df = parse_chart_data('{"chartData": []}', "JFC", "")
    assert df.columns.tolist() == PRICE_COLUMNS
    assert len(df) == 0


def test_trim_to_window():
    df = parse_chart_data(
        _read("chart_data_jfc.json"), "JFC", "Tue, 01 Mar 2022 16:00:00 GMT"
    )
    only_first = trim_to_window(df, dt.date(2022, 3, 1), dt.date(2022, 3, 1))
    assert only_first["date"].tolist() == [dt.date(2022, 3, 1)]
    assert len(trim_to_window(df, None, None)) == 2


def test_unknown_symbol_raises():
    from pse_stocks_etl_spark.sources.pse_edge import PseEdgeClient, UnknownSymbolError

    class _Resp:
        text = "[]"
        status_code = 200

        def raise_for_status(self):
            pass

    class _FakeRequests:
        @staticmethod
        def get(url):
            return _Resp()

    c = PseEdgeClient()
    c._requests = _FakeRequests()
    with pytest.raises(UnknownSymbolError):
        c.get_company_info("NOPE")
