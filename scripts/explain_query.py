"""Dump the formatted physical plan of any registered query — the dev
loop for the plan audits SCALE.md documents and
tests/test_plans_physical.py asserts.

Usage: python scripts/explain_query.py <query_name> [sf_dir]
       python scripts/explain_query.py --list
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pse_stocks_etl_spark import plans

    if len(sys.argv) < 2 or sys.argv[1] == "--list":
        for name, q in plans.REGISTRY.items():
            print(f"{name:35s} {'oracle' if q.oracle else 'rows-only':9s} "
                  f"{','.join(q.tags)}")
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    if name not in plans.REGISTRY:
        sys.exit(f"unknown query {name!r}; try --list")

    from pse_stocks_etl_spark.session import get_spark

    spark = get_spark("explain", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    jvm = spark.sparkContext._jvm
    print(jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))


if __name__ == "__main__":
    main()
