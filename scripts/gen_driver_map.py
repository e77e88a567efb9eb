"""Regenerate COVERAGE.md's driver-verification map table from the
recorded CORRECTNESS_r*.json files + the live registry order. Run after
every rotation; tests/test_docs_contract.py asserts the committed table
matches this output row-for-row."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pse_stocks_etl_spark import plans  # noqa: E402
from pse_stocks_etl_spark.testing import driver_history  # noqa: E402


def rows() -> list[str]:
    hist = driver_history(REPO)
    names = list(plans.REGISTRY)
    window = set(names[:50])
    out = []
    for name in names:
        h = hist.get(name, "—")
        status = "in current window" if name in window else "—"
        out.append(f"| `{name}` | {h} | {status} |")
    return out


if __name__ == "__main__":
    print("| query | driver rows so far | rotation |")
    print("|---|---|---|")
    print("\n".join(rows()))
