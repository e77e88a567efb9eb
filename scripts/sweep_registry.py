"""Screening sweep: run EVERY registered query once (noop sink) in one
warm session and print per-query wall seconds as JSON — the coverage
pass over the ~260 non-headliners the bench doesn't time (guide §1:
measure first, every operator). Numbers are cold-per-query within a
warm session (first execution pays codegen + its own working-set
build), so they screen for structural outliers; confirm any suspect
with a warm re-run or scripts/profile_query.py before acting.

Usage: python scripts/sweep_registry.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.session import get_spark

    spark = get_spark("sweep")
    out: dict[str, object] = {}
    for name in sorted(plans.REGISTRY):
        t0 = time.perf_counter()
        try:
            plans.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {e}"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
