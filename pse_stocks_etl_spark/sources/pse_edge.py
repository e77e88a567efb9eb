"""PSE Edge market-data connector (SURVEY.md §2.1 S1-S3).

The reference fetches from the PSE Edge REST/HTML endpoints with
driver-side requests + a thread pool (reference: src/utils/pse_edge.py,
src/utils/multithreading.py). This engine keeps the connector OUT of the
query path and distributes the fetch itself:

- `PseEdgeClient` — the real HTTP client surface (company directory,
  company info, daily price history). The TRANSPORT is injectable: the
  default `RequestsTransport` does live HTTP (with per-call
  connect/read timeouts and bounded retry+backoff — a stalled
  connection can never hang a sync), while tests inject a recorded
  transport so all three client methods run their full
  request→parse→normalize path hermetically. `requests` itself is
  absent from this image, so the live transport raises a
  clearly-marked NotImplementedError at construction.
- `FakePseEdge` — a deterministic synthetic market-data source with the
  exact same contract, seeded per (symbol, date) via md5, used by tests
  and the sync demo. Prices are 2-dp decimals satisfying
  low <= min(open, close) <= max(open, close) <= high.
- `distributed_fetch` — the Spark-native replacement for the
  reference's thread pool (multithreading.py:20-76): the per-key fetch
  windows (a DataFrame) are repartitioned by symbol and each executor
  partition pulls its symbols' history inside `mapInPandas`. At 1000
  executors this is 1000-way parallel ingest with no driver bottleneck;
  per-partition batches arrive as Arrow, already in the fact schema.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from datetime import date, timedelta

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

COMPANY_COLUMNS = ["symbol", "company_name", "sector", "subsector", "listing_date", "extracted_at"]
PRICE_COLUMNS = ["symbol", "date", "open", "high", "low", "close", "extracted_at"]

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        # NTZ — wall-clock extract stamp, session-tz-independent (the
        # same rule as the store schemas, schemas.py)
        T.StructField("extracted_at", T.TimestampNTZType(), True),
    ]
)


class UnknownSymbolError(Exception):
    """Raised when a symbol has no exact match in PSE Edge (the
    reference's UnknownSymbolException, pse_edge.py:63-67)."""


class RequestsTransport:
    """Live HTTP transport: `requests` with (connect, read) timeouts on
    every call and bounded retry with exponential backoff on transient
    failures (connection errors, timeouts, HTTP 5xx). 4xx responses
    raise immediately — retrying a bad request never helps.

    The reference's requests calls pass no timeout (reference
    pse_edge.py:80-118); this surface runs on real networks, so a
    stalled connection must fail the task, not hang the sync.
    """

    def __init__(
        self,
        timeout: tuple[float, float] = (5.0, 30.0),
        retries: int = 3,
        backoff: float = 1.0,
    ) -> None:
        try:
            import requests
        except ImportError:
            raise NotImplementedError(
                "PSE Edge HTTP connector requires network + `requests`; "
                "use FakePseEdge or a recorded transport in offline "
                "environments."
            ) from None
        self._requests = requests
        self.timeout = timeout
        self.retries = retries
        self.backoff = backoff

    def _call(self, fn) -> tuple[str, dict]:  # pragma: no cover - network
        import time

        exc = self._requests.exceptions
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                r = fn()
                if r.status_code >= 500 and attempt < self.retries - 1:
                    last = exc.HTTPError(f"HTTP {r.status_code}", response=r)
                    time.sleep(self.backoff * (2**attempt))
                    continue
                r.raise_for_status()
                return r.text, dict(r.headers)
            except (exc.ConnectionError, exc.Timeout) as e:
                last = e
                if attempt < self.retries - 1:
                    time.sleep(self.backoff * (2**attempt))
        raise last  # type: ignore[misc]

    def get(self, url: str) -> tuple[str, dict]:  # pragma: no cover - network
        return self._call(lambda: self._requests.get(url, timeout=self.timeout))

    def post(
        self, url: str, data: dict | None = None, json: dict | None = None
    ) -> tuple[str, dict]:  # pragma: no cover - network
        return self._call(
            lambda: self._requests.post(url, data=data, json=json, timeout=self.timeout)
        )


class UrllibTransport:
    """Live HTTP transport on the STANDARD LIBRARY only (urllib) — the
    same contract as RequestsTransport (timeouts on every call, bounded
    retry with exponential backoff on transient failures and HTTP 5xx,
    4xx raise immediately), with zero third-party dependencies, so the
    live connector runs in any Python environment including this one.
    Proven over real sockets by the loopback-server tests
    (tests/test_pse_edge_live.py)."""

    def __init__(
        self, timeout: float = 30.0, retries: int = 3, backoff: float = 1.0
    ) -> None:
        self.timeout = timeout
        self.retries = retries
        self.backoff = backoff

    def _call(self, make_request) -> tuple[str, dict]:
        import time
        import urllib.error
        import urllib.request

        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                with urllib.request.urlopen(
                    make_request(), timeout=self.timeout
                ) as r:
                    return r.read().decode("utf-8"), dict(r.headers)
            except urllib.error.HTTPError as e:
                if e.code >= 500 and attempt < self.retries - 1:
                    last = e
                    time.sleep(self.backoff * (2**attempt))
                    continue
                raise
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last = e
                if attempt < self.retries - 1:
                    time.sleep(self.backoff * (2**attempt))
        raise last  # type: ignore[misc]

    def get(self, url: str) -> tuple[str, dict]:
        import urllib.request

        return self._call(lambda: urllib.request.Request(url))

    def post(
        self, url: str, data: dict | None = None, json: dict | None = None
    ) -> tuple[str, dict]:
        import json as jsonlib
        import urllib.parse
        import urllib.request

        if json is not None:
            body = jsonlib.dumps(json).encode("utf-8")
            ctype = "application/json"
        else:
            body = urllib.parse.urlencode(data or {}).encode("utf-8")
            ctype = "application/x-www-form-urlencoded"

        return self._call(
            lambda: urllib.request.Request(
                url, data=body, headers={"Content-Type": ctype}, method="POST"
            )
        )


class PseEdgeClient:
    """Driver-side HTTP connector against the public PSE Edge endpoints
    (the reference's extractor surface, pse_edge.py:70-261).

    All response EXTRACTION is pure and lives in pse_edge_parse.py; the
    transport is injected (`transport=`), so the full
    request→parse→normalize path of all three methods runs hermetically
    against recorded responses — including the reference's own golden
    values (JFC company_id=86 / security_id=158; 2022-03-01 OHLC
    241.4/245/240/240; reference tests/integration/test_pse_edge.py:
    38-46, 60-75). The default transport is live `RequestsTransport`
    (constructed lazily on first use, since this image lacks
    `requests`)."""

    COMPANY_SEARCH_URL = "https://edge.pse.com.ph/companyDirectory/search.ax"
    AUTOCOMPLETE_URL = (
        "https://edge.pse.com.ph/autoComplete/searchCompanyNameSymbol.ax?term={}"
    )
    STOCK_DATA_URL = "https://edge.pse.com.ph/common/DisclosureCht.ax"
    SEARCH_PAYLOAD = {
        "pageNo": "",
        "companyId": "",
        "keyword": "",
        "sortType": "",
        "dateSortType": "DESC",
        "cmpySortType": "DESC",
        "symbolSortType": "ASC",
        "sector": "ALL",
        "subsector": "ALL",
    }

    def __init__(self, transport=None) -> None:
        self._transport = transport

    @property
    def transport(self):
        if self._transport is None:
            try:
                self._transport = RequestsTransport()
            except NotImplementedError:
                # stdlib fallback: live HTTP works without `requests`
                self._transport = UrllibTransport()
        return self._transport

    def _search_page(self, **payload) -> tuple[str, str]:
        text, headers = self.transport.post(
            self.COMPANY_SEARCH_URL, data={**self.SEARCH_PAYLOAD, **payload}
        )
        return text, headers.get("Date", "")

    def get_listed_companies(self) -> pd.DataFrame:
        """S1: paginated company-directory scan → COMPANY_COLUMNS frame
        (reference pse_edge.py:80-118: first page discovers the page
        count from the pager anchors, then every page's table parses)."""
        from .pse_edge_parse import normalize_companies, parse_directory_page

        html, retrieved_at = self._search_page(pageNo=1)
        rows, page_count = parse_directory_page(html)
        for page in range(2, page_count + 1):
            page_html, _ = self._search_page(pageNo=page)
            rows.extend(parse_directory_page(page_html)[0])
        return normalize_companies(rows, retrieved_at)

    def get_company_info(self, symbol: str) -> dict:
        """S2: company point lookup (reference pse_edge.py:120-178):
        autocomplete exact-match → company_id, then the metadata table →
        security_id / sector / subsector / listing date."""
        from .pse_edge_parse import filter_autocomplete, parse_company_info_page

        text, _ = self.transport.get(self.AUTOCOMPLETE_URL.format(symbol))
        hit = filter_autocomplete(text, symbol)
        if hit is None:
            raise UnknownSymbolError(f"Symbol {symbol!r} was not found in PSE Edge.")
        html, _ = self._search_page(
            companyId=hit["company_id"], keyword=hit["company_id"], sortType="cmpy"
        )
        return parse_company_info_page(
            html, symbol, hit["company_name"], hit["company_id"]
        )

    def get_stock_data(self, symbol: str, start: date, end: date) -> pd.DataFrame:
        """S3: daily OHLC history for [start, end] → PRICE_COLUMNS frame
        (reference pse_edge.py:182-261: chartData JSON, empty
        short-circuit, max-close dedup)."""
        from .pse_edge_parse import parse_chart_data, trim_to_window

        info = self.get_company_info(symbol)
        text, headers = self.transport.post(
            self.STOCK_DATA_URL,
            json={
                "cmpy_id": info["company_id"],
                "security_id": info["security_id"],
                "startDate": pd.Timestamp(start).strftime("%m-%d-%Y"),
                "endDate": pd.Timestamp(end).strftime("%m-%d-%Y"),
            },
        )
        parsed = parse_chart_data(text, symbol, headers.get("Date", ""))
        return trim_to_window(parsed, start, end)


class FakePseEdge:
    """Deterministic offline stand-in for PseEdgeClient.

    Every value derives from md5(symbol, field, date) — stable across
    runs, processes, and executors, so distributed fetches are
    reproducible and sync replays are exactly idempotent (T4).
    """

    SECTORS = ["Industrial", "Financials", "Property", "Holding Firms", "Services"]

    def __init__(
        self,
        symbols: list[str] | None = None,
        extracted_at: str = "2024-01-02 00:00:00",
        history_start: str = "2024-01-01",
    ):
        self.symbols = symbols or ["JFC", "SM", "ALI", "BDO", "TEL", "URC", "MER", "AC"]
        self.extracted_at = pd.Timestamp(extracted_at)
        # Earliest date the fake exchange has data for — like the real
        # API, requests further back return nothing (keeps epoch-default
        # backfills cheap).
        self.history_start = date.fromisoformat(history_start)

    @staticmethod
    def _h(seed: str) -> int:
        return int(hashlib.md5(seed.encode()).hexdigest()[:12], 16)

    def get_listed_companies(self) -> pd.DataFrame:
        rows = []
        for s in self.symbols:
            h = self._h(f"co:{s}")
            rows.append(
                {
                    "symbol": s,
                    "company_name": f"{s} Corporation",
                    "sector": self.SECTORS[h % len(self.SECTORS)],
                    "subsector": f"Subsector {(h >> 8) % 7}",
                    "listing_date": date(1990 + h % 30, 1 + (h >> 4) % 12, 1 + (h >> 8) % 28),
                    "extracted_at": self.extracted_at,
                }
            )
        return pd.DataFrame(rows, columns=COMPANY_COLUMNS)

    def get_company_info(self, symbol: str) -> dict:
        df = self.get_listed_companies()
        row = df[df.symbol == symbol].iloc[0]
        return {**row.to_dict(), "company_id": self._h(f"id:{symbol}") % 1000}

    def get_stock_data(self, symbol: str, start: date, end: date) -> pd.DataFrame:
        rows = []
        d = max(start, self.history_start)
        while d <= end:
            if d.weekday() < 5:  # trading days only
                base = 50 + self._h(f"px:{symbol}:{d.isoformat()}") % 45000 / 100.0
                spread = (self._h(f"sp:{symbol}:{d.isoformat()}") % 500) / 100.0
                o = round(base, 2)
                c = round(base + ((self._h(f"cl:{symbol}:{d}") % 200) - 100) / 100.0, 2)
                rows.append(
                    {
                        "symbol": symbol,
                        "date": d,
                        "open": o,
                        "high": round(max(o, c) + spread, 2),
                        "low": round(max(0.01, min(o, c) - spread), 2),
                        "close": c,
                        "extracted_at": self.extracted_at,
                    }
                )
            d += timedelta(days=1)
        return pd.DataFrame(rows, columns=PRICE_COLUMNS)


def distributed_fetch(
    windows_df: DataFrame,
    fetch_fn: Callable[[str, date, date], pd.DataFrame],
    key_col: str = "symbol",
    start_col: str = "target_start",
    end_col: str = "target_end",
) -> DataFrame:
    """T5 re-architected: executor-side fetch over the pending-window plan.

    `windows_df` is the output of operators.watermark.incremental_windows
    (one row per key needing data). Repartition by key → each task fetches
    its keys' windows via `fetch_fn` and yields Arrow batches in the fact
    schema. Replaces the reference's driver thread pool
    (multithreading.py:62-66) with Spark's own task scheduling.
    """

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                got = fetch_fn(
                    getattr(row, key_col),
                    getattr(row, start_col),
                    getattr(row, end_col),
                )
                if got is not None and len(got):
                    out.append(got)
            yield (
                pd.concat(out, ignore_index=True)
                if out
                else pd.DataFrame(columns=PRICE_COLUMNS)
            )

    n = max(windows_df.sparkSession.sparkContext.defaultParallelism, 1)
    return (
        windows_df.repartition(n, key_col)
        .mapInPandas(fetch_partition, schema=FETCH_RESULT_SCHEMA)
    )
