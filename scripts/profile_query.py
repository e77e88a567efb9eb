"""Profile one or more registered queries with the Spark UI REST API:
run the query to a noop sink (guide §1.4) on a bench-shaped session
with the UI enabled, then dump per-stage wall time, task time, shuffle
read/write bytes, input bytes and spill — the empirical loop of guide
§1.1 without a browser.

Usage: python scripts/profile_query.py <query> [query ...] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.llm_queries import clear_working_set_caches
    from pse_stocks_etl_spark.session import get_spark

    spark = get_spark(
        "profile",
        **{"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    for name in names:
        q = plans.REGISTRY[name]
        # warm-up run (codegen, working-set build)
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        clear_working_set_caches()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        before_stages = {s["stageId"] for s in rest("/stages")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        stages = [
            s
            for s in rest("/stages?status=complete")
            if s["stageId"] not in before_stages
        ]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n==== {name}: wall {wall:.2f}s, {len(stages)} stages ====")
        print(
            f"{'stage':>6} {'runTime_s':>9} {'cpu_s':>7} {'tasks':>5} "
            f"{'input_MB':>8} {'shufR_MB':>8} {'shufW_MB':>8} "
            f"{'spill_MB':>8}  name"
        )
        for s in stages[:25]:
            print(
                f"{s['stageId']:>6} "
                f"{s.get('executorRunTime', 0)/1e3:>9.2f} "
                f"{s.get('executorCpuTime', 0)/1e9:>7.2f} "
                f"{s.get('numCompleteTasks', 0):>5} "
                f"{s.get('inputBytes', 0)/1e6:>8.1f} "
                f"{s.get('shuffleReadBytes', 0)/1e6:>8.1f} "
                f"{s.get('shuffleWriteBytes', 0)/1e6:>8.1f} "
                f"{s.get('memoryBytesSpilled', 0)/1e6:>8.1f}  "
                f"{s.get('name', '')[:60]}"
            )
        tot_run = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
        tot_shuf = sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6
        print(
            f"total executorRunTime {tot_run:.1f}s across "
            f"{len(stages)} stages; shuffle write {tot_shuf:.1f} MB"
        )
        # Driver-serialization view (guide §2.6): the query's JOBS in
        # submission order with the gap since the previous job finished
        # — large gaps between many tiny jobs mean the driver is
        # blocking on serial materializations (checkpoints, probes),
        # which a thread-pool overlap can reclaim.
        from datetime import datetime

        def ts(s: str) -> float:
            return datetime.strptime(
                s[:23], "%Y-%m-%dT%H:%M:%S.%f"
            ).timestamp()

        jobs = [
            j
            for j in rest("/jobs")
            if f"profile:{name}" in (j.get("description") or "")
        ]
        jobs.sort(key=lambda j: j["jobId"])
        if jobs:
            t_first = ts(jobs[0]["submissionTime"])
            prev_end = None
            gaps = 0.0
            print(f"{'job':>5} {'start_s':>8} {'dur_s':>7} {'gap_s':>7}  stages")
            for j in jobs:
                sub = ts(j["submissionTime"])
                end = ts(j.get("completionTime", j["submissionTime"]))
                gap = (sub - prev_end) if prev_end is not None else 0.0
                gaps += max(gap, 0.0)
                print(
                    f"{j['jobId']:>5} {sub - t_first:>8.2f} {end - sub:>7.2f} "
                    f"{gap:>7.2f}  {len(j.get('stageIds', []))}"
                )
                prev_end = max(prev_end or end, end)
            print(
                f"{len(jobs)} jobs; sum of between-job driver gaps "
                f"{gaps:.2f}s of {wall:.2f}s wall"
            )
    spark.stop()


if __name__ == "__main__":
    main()
