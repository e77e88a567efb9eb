"""Same-session interleaved A/B of a runtime SQL conf over registered
queries. Host drift between sessions on this box reaches 2-3x (see
bench.py canaries), which buries any sub-50% effect in an across-session
A/B; alternating the conf value run-by-run inside ONE session (ABAB...)
cancels the drift, and the per-conf MEDIAN of the interleaved runs is
the comparison statistic.

Usage: python scripts/ab_conf.py <conf_key> <valA> <valB> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    key, val_a, val_b = sys.argv[1:4]
    names = sys.argv[4:]
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches
    from pse_stocks_etl_spark.session import get_spark

    spark = get_spark("ab-conf")
    for name in names:  # warm-up pass (JIT, codegen)
        plans.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict[str, list[float]]] = {}
    for name in names:
        q = plans.REGISTRY[name]
        times: dict[str, list[float]] = {val_a: [], val_b: []}
        for _ in range(ROUNDS):
            for val in (val_a, val_b):
                spark.conf.set(key, val)
                clear_working_set_caches()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[val].append(round(time.perf_counter() - t0, 4))
        out[name] = times
        # true median (ADVICE r12: sorted(ts)[n//2] is the UPPER median,
        # biased for even round counts)
        med = {v: statistics.median(ts) for v, ts in times.items()}
        print(
            f"{name}: {val_a} med={med[val_a]:.3f} {val_b} med={med[val_b]:.3f}"
            f"  raw={json.dumps(times)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
