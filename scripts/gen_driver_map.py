"""Regenerate COVERAGE.md's driver-verification map table from the
recorded CORRECTNESS_r*.json files + the live registry order. Run after
every rotation; tests/test_docs_contract.py asserts the committed table
matches this output row-for-row.

Usage:
  python scripts/gen_driver_map.py            # print the table
  python scripts/gen_driver_map.py --write    # patch COVERAGE.md's
      table in place (everything between the '| query |' header and
      the next '## ' section)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pse_stocks_etl_spark import plans  # noqa: E402
from pse_stocks_etl_spark.testing import driver_history  # noqa: E402

HEADER = "| query | driver rows so far | rotation |"

# See testing.DEMOTED_QUERIES: names with old driver rows whose registry
# entry was deliberately retired; rendered as RETIRED rows so the
# cumulative ledger join stays clean.
from pse_stocks_etl_spark.testing import DEMOTED_QUERIES as DEMOTED  # noqa: E402


def rows() -> list[str]:
    hist = driver_history(REPO)
    names = list(plans.REGISTRY)
    window = set(names[:50])
    out = []
    for name in names:
        h = hist.get(name, "—")
        status = "in current window" if name in window else "—"
        out.append(f"| `{name}` | {h} | {status} |")
    for name, why in sorted(DEMOTED.items()):
        h = hist.get(name, "—")
        out.append(f"| `{name}` | {h} | RETIRED: {why} |")
    return out


def table() -> str:
    return "\n".join([HEADER, "|---|---|---|"] + rows())


def write_in_place() -> int:
    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path).read()
    if HEADER not in text:
        print("COVERAGE.md table header not found")
        return 1
    start = text.index(HEADER)
    after = text.index("\n## ", start)
    open(path, "w").write(text[:start] + table() + text[after:])
    print(f"COVERAGE.md driver map rewritten ({len(rows())} rows)")
    return 0


if __name__ == "__main__":
    if "--write" in sys.argv[1:]:
        raise SystemExit(write_in_place())
    print(table())
