"""Driver-side overlap of independent plan materializations (guide
§2.6 "Overlap independent jobs").

A `localCheckpoint(eager=False)` call is NOT free on the driver: the
Dataset→RDD conversion executes the AdaptiveSparkPlan, which BLOCKS
submitting every exchange-stage job of that subplan before returning
the (lazily computed) final-stage RDD. A query that builds several
checkpointed intermediates therefore serializes their shuffle jobs in
plain source order, leaving the executors idle between them — the r13
profile of corpus_build_increment showed 2.5s of between-job driver
gaps in a 4.6s run. Where the intermediates are independent given
their shared inputs, running the blocking calls from a small thread
pool lets the scheduler overlap their stages (FIFO scheduling
back-fills the tail of one chain with the next chain's tasks).

Spark-specific care:
- Job description / group / scheduler pool are THREAD-LOCAL on the
  SparkContext; jobs submitted from worker threads would otherwise
  lose the caller's labels (bench.py and the profilers identify a
  query's jobs by description). Each worker re-applies the caller's
  local properties before running its thunk.
- Failures re-raise in the caller (first exception wins), so error
  behavior matches the serial form.
- Concurrent chains may race to compute a SHARED upstream persisted /
  checkpointed frame (e.g. the featurized corpus): the block manager's
  per-block locks make that safe — one task computes a partition, the
  rest wait for the cached block — so shared inputs need no extra
  coordination.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

from pyspark.sql import SparkSession

# The caller's thread-local scheduling state worth propagating into
# workers. (pyspark.InheritableThread exists for the general case; an
# explicit copy keeps this dependency-free and works with a pool.)
_LOCAL_PROPS = (
    "spark.job.description",
    "spark.jobGroup.id",
    "spark.job.interruptOnCancel",
    "spark.scheduler.pool",
)


def overlap(spark: SparkSession, *thunks: Callable[[], Any]) -> list:
    """Run the thunks concurrently on driver threads; return their
    results in argument order. Use for independent driver-blocking
    materializations (localCheckpoint chains, persist+count probes,
    store-table loads); keep each thunk's internal dependencies
    sequential inside that thunk."""
    sc = spark.sparkContext
    props = [(k, sc.getLocalProperty(k)) for k in _LOCAL_PROPS]

    def run(thunk: Callable[[], Any]) -> Any:
        for k, v in props:
            if v is not None:
                sc.setLocalProperty(k, v)
        try:
            return thunk()
        finally:
            # Workers are pool threads; drop the labels so a reused
            # thread never mislabels a later, unrelated submission.
            for k, _ in props:
                sc.setLocalProperty(k, None)

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(run, t) for t in thunks]
        # result() re-raises the thunk's exception; collecting in order
        # keeps deterministic attribution of the first failure.
        return [f.result() for f in futures]
