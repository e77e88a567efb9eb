"""Time individual queries with EXACTLY bench.py's methodology (global
warm-up, per-query cache clear + GC, best of $SPARK_GRAFT_BENCH_RUNS
noop-sink runs) without paying for the other 38 headliners — the A/B
loop of the optimization round.

Usage: python scripts/bench_one.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches
    from pse_stocks_etl_spark.session import get_spark

    spark = get_spark("bench-one")
    for name in names:  # warm-up pass (JIT, codegen)
        plans.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    timings = {}
    for name in names:
        q = plans.REGISTRY[name]
        clear_working_set_caches()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    spark.stop()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
