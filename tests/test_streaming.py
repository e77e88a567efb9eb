"""Structured Streaming incrementality: windowed agg parity with the
batch plan, and the foreachBatch merge sink (SURVEY.md §2.9)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pse_stocks_etl_spark.sources.catalog import load_table
from pse_stocks_etl_spark.store.parquet_table import ParquetTable
from pse_stocks_etl_spark.streaming.incremental import (
    foreach_batch_merge,
    stream_events,
    windowed_event_counts,
)


def test_streaming_window_agg_matches_batch(spark, sf_dir, tmp_path):
    events = stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    agg = windowed_event_counts(events)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stream_agg")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_stream_agg")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n")
    )
    s = {(r.window_start, r.event_type): r.n for r in got.collect()}
    b = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert s == b


def test_foreach_batch_merge_sink(spark, sf_dir, tmp_path):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    table = ParquetTable(spark, str(tmp_path / "sink"), schema)
    table.init_empty()
    events = stream_events(spark, os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    q = foreach_batch_merge(
        events, table, keys=("event_id",), freshness_col="ts",
        checkpoint=str(tmp_path / "ck2"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_events = load_table(spark, sf_dir, "events").count()
    assert table.read().count() == n_events
    # second run from a fresh checkpoint replays the batch — merge converges
    q2 = foreach_batch_merge(
        events, table, keys=("event_id",), freshness_col="ts",
        checkpoint=str(tmp_path / "ck3"),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert table.read().count() == n_events


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """At-least-once delivery (the same file streamed from two source
    dirs) collapses to exactly-once rows through
    dropDuplicatesWithinWatermark, with state bounded by the watermark."""
    import shutil
    import uuid

    from pse_stocks_etl_spark.streaming.incremental import streaming_dedup

    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    f = os.path.join(sf_dir, "events.parquet")
    shutil.copy(f, os.path.join(src, "a.parquet"))
    shutil.copy(f, os.path.join(src, "b.parquet"))  # redelivery of every row

    events = stream_events(spark, src)
    deduped = streaming_dedup(events, keys=("event_id",))
    name = f"dedup_out_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_unique = load_table(spark, sf_dir, "events").count()
    got = spark.table(name).count()
    assert got == n_unique  # 2x delivered, 1x emitted
