"""CLI — the reference's entry-point surface (reference src/main.py:23-49:
`--destination {postgres,bigquery,deltalake} --action {initdb,backfill,sync}
--concurrency N`) re-expressed for the Spark engine.

Destinations collapse to the parquet/Delta-style store (`--root`);
`--concurrency` maps to Spark parallelism instead of a thread-pool size.

    python -m pse_stocks_etl_spark --action sync --root /tmp/pse
    python -m pse_stocks_etl_spark --action backfill --root /tmp/pse
    python -m pse_stocks_etl_spark --action initdb --root /tmp/pse
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pse_stocks_etl_spark")
    ap.add_argument(
        "--action",
        choices=["initdb", "backfill", "sync"],
        required=True,
        help="initdb: create empty tables; sync: incremental; backfill: 100y lookback",
    )
    ap.add_argument("--root", required=True, help="table store root directory")
    ap.add_argument(
        "--concurrency",
        type=int,
        default=None,
        help="Spark local parallelism (default: all cores)",
    )
    ap.add_argument(
        "--today",
        default=None,
        help="pin the business date (YYYY-MM-DD) for deterministic runs",
    )
    ap.add_argument(
        "--connector",
        choices=["fake", "pse-edge"],
        default="fake",
        help="fake: deterministic offline source; pse-edge: live HTTP (needs network)",
    )
    args = ap.parse_args(argv)

    from .plans.sync import PseDatasets
    from .session import get_spark
    from .sources.pse_edge import FakePseEdge, PseEdgeClient

    master = f"local[{args.concurrency}]" if args.concurrency else None
    spark = get_spark("pse-sync-cli", master=master)
    connector = FakePseEdge() if args.connector == "fake" else PseEdgeClient()
    ds = PseDatasets(spark, args.root, connector=connector)

    if args.action == "initdb":
        ds.initdb()
        out = {"action": "initdb", "companies": 0, "price_rows": 0}
    elif args.action == "sync":
        ds.initdb()
        out = {"action": "sync", **ds.sync(today=args.today)}
    else:
        ds.initdb()
        out = {"action": "backfill", **ds.backfill(today=args.today)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
