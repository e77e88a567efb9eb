"""AQE skew-join behavior, pinned: the engine's session enables
adaptive execution (session.py), and at 100 TB hot keys are handled by
(a) AQE's runtime skew-join split where Spark CAN apply it, and (b)
explicit salting (ext_queries.salted_hot_key_agg) where it can't.
These tests pin the boundary so the SCALE.md guidance stays true on
upgrades: AQE splits a skewed SortMergeJoin with free output
partitioning, and it DECLINES when a downstream aggregate requires the
join's hash partitioning (splitting would break co-partitioning and
force an extra shuffle) — which is exactly why the salting technique
exists in this engine rather than "AQE handles everything".
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_join(spark):
    # hot key 7 owns 80% of the left side — far past factor-2 skew
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 5 != 0, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return left.join(right, "k")


def test_aqe_splits_skewed_join_when_partitioning_is_free(spark):
    with _skew_conf(spark):
        j = _skewed_join(spark)
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:1500]


def test_aqe_declines_split_under_downstream_partitioning(spark):
    """With an aggregate on the join key downstream, OptimizeSkewedJoin
    must NOT split (it would break the co-partitioning the aggregate
    reuses and force a re-shuffle of the hot key anyway). This is the
    case the engine handles with explicit salting — see
    ext_queries.salted_hot_key_agg and SCALE.md."""
    with _skew_conf(spark):
        agg = _skewed_join(spark).groupBy("k").agg(F.sum("v").alias("s"))
        rows = agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
    # left keys: 7 (hot) plus the 200 multiples of 5 under 1000
    assert len(rows) == 201
    assert "skew=true" not in plan
    # the aggregate really reuses the join's partitioning: no exchange
    # between the SortMergeJoin and the final HashAggregate
    after_join = plan.split("SortMergeJoin", 1)[0]
    assert "Exchange hashpartitioning(k" not in after_join, plan[:1500]
