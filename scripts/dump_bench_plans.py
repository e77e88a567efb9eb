"""Dump .explain("formatted") for every bench=True query into
plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt (default r13) — the
before/after plan evidence the optimization round commits next to the
code (OPTIMIZATION_r<N>.md).

The session mirrors bench.py (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cores, AQE on) so the captured initial plans are the ones
the bench actually executes. Streaming drives return a memory-table
frame whose batch plan is vacuous; for those the captured file records
the LAST micro-batch's executed-plan digest instead (the same
convention bench.py uses).

Usage: python scripts/dump_bench_plans.py <suffix> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans import pipeline_queries as _pq
    from pse_stocks_etl_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm

    names = [n for n in sorted(plans.REGISTRY) if plans.REGISTRY[n].bench]
    if only:
        names = [n for n in names if n in only]
    for name in names:
        _pq.LAST_STREAM_PLAN_DIGEST = None
        df = plans.REGISTRY[name].fn(spark, sf_dir)
        text = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if _pq.LAST_STREAM_PLAN_DIGEST is not None:
            text = (
                f"[streaming drive: last micro-batch digest "
                f"{_pq.LAST_STREAM_PLAN_DIGEST}]\n\n" + text
            )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
