"""Per-micro-batch durationMs breakdown for the streaming drives:
runs each drive's stream (same runner code paths as the registered
queries) and prints every batch's lastProgress durations — addBatch,
getBatch, queryPlanning, walCommit, commitOffsets, triggerExecution —
plus the stateOperators' commit times. The empirical view of where the
drives' wall time goes (guide §1.1), since the bench only sees the
total. Usage: python scripts/stream_progress.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def drain(name: str, q) -> None:
    q.processAllAvailable()
    print(f"\n==== {name} ====")
    for p in q.recentProgress:
        dur = p.get("durationMs", {})
        ops = [
            {
                "op": so.get("operatorName"),
                "commit_ms": so.get("commitTimeMs"),
                "rows_total": so.get("numRowsTotal"),
                "mem_used": so.get("memoryUsedBytes"),
            }
            for so in p.get("stateOperators", [])
        ]
        print(
            json.dumps(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": dur,
                    "stateOperators": ops,
                },
                separators=(",", ":"),
            )
        )
    q.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import uuid

    from pse_stocks_etl_spark.plans.pipeline_queries import _stream_partitions
    from pse_stocks_etl_spark.session import get_spark
    from pse_stocks_etl_spark.streaming.incremental import (
        interval_join_clicks,
        stream_events,
        windowed_event_counts,
    )

    spark = get_spark("stream-progress")
    ev_path = os.path.join(sf_dir, "events.parquet")

    def run(name, make_df, mode):
        df = make_df()
        with _stream_partitions(spark):
            q = (
                df.writeStream.outputMode(mode)
                .format("memory")
                .queryName(f"prog_{uuid.uuid4().hex[:8]}")
                .start()
            )
            drain(name, q)

    # warm-up one drive so codegen/JIT doesn't pollute the breakdown
    run("warmup_hourly", lambda: windowed_event_counts(stream_events(spark, ev_path)), "complete")

    run("hourly_counts", lambda: windowed_event_counts(stream_events(spark, ev_path)), "complete")
    run(
        "click_semi_join",
        lambda: interval_join_clicks(stream_events(spark, ev_path), join_type="left_semi"),
        "append",
    )
    run(
        "click_outer_join",
        lambda: interval_join_clicks(stream_events(spark, ev_path), join_type="left_outer"),
        "append",
    )
    spark.stop()


if __name__ == "__main__":
    main()
