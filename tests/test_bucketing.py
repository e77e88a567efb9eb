"""Bucketed co-located joins: pre-bucketing both sides of a recurring
join on the join key removes the shuffle entirely (SCALE.md "Joins";
pyspark guide "Bucketing"). At 100 TB this is the difference between
re-shuffling the fact table per query and never shuffling it."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pse_stocks_etl_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # warehouse dir is a static conf — saveAsTable lands in the default
    # spark-warehouse/ (gitignored); tables are dropped on teardown.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    # At test scale the optimizer would broadcast; disable it so the plan
    # shows what happens at real scale (both sides too big to broadcast).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("l_orderkey").count()
        jvm = spark.sparkContext._jvm
        plan = jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "formatted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # The join itself must not introduce an exchange: both sides are
    # bucketed on the join key with the same bucket count.
    join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert len(re.findall(r"\(\d+\) Exchange", join_section)) == 0, plan[:3000]
    # and the result matches the plain (shuffled) join
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join proof: one hot key dominating a sort-merge join
    must be split at runtime (the executedPlan carries the skew marker).
    Thresholds are forced down so the optimization triggers at test
    scale; at 100 TB the defaults (256 MB partitions) do the same job
    without salting the query by hand."""
    conf = spark.conf
    prev = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # the downstream aggregation could reuse the join's partitioning,
        # so without force, AQE declines the split (it would add an
        # exchange); production plans end at sinks where the default
        # applies — force keeps the proof at test scale
        conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # left: 50k rows, 99% on ONE key, wide payload so the hot
        # shuffle partition dwarfs the 16KB skew threshold
        left = spark.range(0, 50_000).select(
            F.when(F.col("id") % 100 < 99, 0).otherwise(F.col("id") % 10).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 10).select(F.col("id").alias("k"),
                                          (F.col("id") * 2).alias("dim"))
        joined = (
            left.join(right, "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.max("payload").alias("p"))
        )
        joined.collect()  # AQE decisions happen at runtime
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in prev.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
