"""LIVE-HTTP execution of the S1/S2/S3 connector surface over real
sockets: a loopback http.server serves the recorded PSE Edge fixture
bodies at the real endpoint paths, and the stdlib UrllibTransport
drives the full request→parse→normalize chain — no `requests`, no
external network, genuine HTTP (status lines, headers, form/json
bodies, retries) end to end. The golden assertions are the reference's
own (JFC 86/158; 2022-03-01 OHLC 241.4/245/240/240)."""

from __future__ import annotations

import datetime as dt
import json as jsonlib
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "pse_edge")


def _read(name: str) -> bytes:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


class _PseEdgeHandler(BaseHTTPRequestHandler):
    """Serves the recorded fixture bodies at the real endpoint paths,
    plus a /flaky path that fails with 500 twice before succeeding."""

    flaky_failures = {"n": 0}

    def log_message(self, *args):  # quiet
        pass

    def _send(self, body: bytes, status: int = 200, ctype: str = "text/html"):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Date", "Tue, 01 Mar 2022 16:00:00 GMT")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if "searchCompanyNameSymbol.ax" in self.path:
            self._send(_read("autocomplete_jfc.json"), ctype="application/json")
        elif self.path.startswith("/flaky"):
            self.flaky_failures["n"] += 1
            if self.flaky_failures["n"] <= 2:
                self._send(b"transient", status=500)
            else:
                self._send(b"recovered")
        elif self.path.startswith("/missing"):
            self._send(b"no", status=404)
        else:
            self._send(b"not found", status=404)

    def do_POST(self):
        length = int(self.headers.get("Content-Length", "0"))
        raw = self.rfile.read(length)
        if self.path.endswith("search.ax"):
            form = dict(urllib.parse.parse_qsl(raw.decode()))
            if form.get("companyId"):
                assert form["sortType"] == "cmpy"
                self._send(_read("company_info_jfc.html"))
            else:
                page = int(form["pageNo"])
                self._send(_read(f"company_search_page{page}.html"))
        elif self.path.endswith("DisclosureCht.ax"):
            payload = jsonlib.loads(raw.decode())
            assert payload["cmpy_id"] == "86" and payload["security_id"] == "158"
            self._send(_read("chart_data_jfc.json"), ctype="application/json")
        else:
            self._send(b"not found", status=404)


@pytest.fixture(scope="module")
def server_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _PseEdgeHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _live_client(server_url):
    from pse_stocks_etl_spark.sources.pse_edge import PseEdgeClient, UrllibTransport

    class LoopbackClient(PseEdgeClient):
        COMPANY_SEARCH_URL = f"{server_url}/companyDirectory/search.ax"
        AUTOCOMPLETE_URL = (
            f"{server_url}/autoComplete/searchCompanyNameSymbol.ax?term={{}}"
        )
        STOCK_DATA_URL = f"{server_url}/common/DisclosureCht.ax"

    return LoopbackClient(transport=UrllibTransport(timeout=5.0, backoff=0.01))


def test_live_http_get_listed_companies(server_url):
    df = _live_client(server_url).get_listed_companies()
    assert df["symbol"].tolist() == ["JFC", "SM", "ALI"]
    assert df.loc[0, "listing_date"] == dt.date(1993, 7, 14)


def test_live_http_get_company_info(server_url):
    info = _live_client(server_url).get_company_info("JFC")
    assert info["company_id"] == "86" and info["security_id"] == "158"
    assert info["sector"] == "Industrial"


def test_live_http_get_stock_data(server_url):
    df = _live_client(server_url).get_stock_data(
        "JFC", dt.date(2022, 3, 1), dt.date(2022, 3, 1)
    )
    r = df.iloc[0]
    assert (r["open"], r["high"], r["low"], r["close"]) == (241.4, 245.0, 240.0, 240.0)
    assert len(df) == 1


def test_urllib_transport_retries_transient_5xx(server_url):
    from pse_stocks_etl_spark.sources.pse_edge import UrllibTransport

    _PseEdgeHandler.flaky_failures["n"] = 0
    text, headers = UrllibTransport(timeout=5.0, backoff=0.01).get(
        f"{server_url}/flaky"
    )
    assert text == "recovered"
    assert _PseEdgeHandler.flaky_failures["n"] == 3  # two 500s then success


def test_urllib_transport_raises_immediately_on_4xx(server_url):
    import urllib.error

    from pse_stocks_etl_spark.sources.pse_edge import UrllibTransport

    with pytest.raises(urllib.error.HTTPError):
        UrllibTransport(timeout=5.0, backoff=0.01).get(f"{server_url}/missing")
