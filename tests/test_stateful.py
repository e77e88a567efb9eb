"""applyInPandasWithState: per-key state carried across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pse_stocks_etl_spark.sources.catalog import load_table
from pse_stocks_etl_spark.streaming.incremental import stream_events
from pse_stocks_etl_spark.streaming.stateful import running_user_stats


def test_running_user_stats_across_batches(spark, sf_dir, tmp_path):
    # Split events into 2 files → with maxFilesPerTrigger=1, two
    # micro-batches; state must carry counts across them.
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(os.path.join(src, "a.parquet"))
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(os.path.join(src, "b.parquet"))

    # These files were written by Spark (µs NTZ timestamps), unlike the
    # driver's nano parquet — declare the schema as written.
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")  # part files live in subdirs
        .format("parquet")
        .load(src)
    )
    q = (
        running_user_stats(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("t_stateful")
    # last emitted row per user == full batch totals
    latest = {
        r.user_id: r
        for r in out.orderBy("last_seen_us").collect()  # later rows overwrite
    }
    expect = {
        r.user_id: (r.n, int(round(r.s * 100)))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(latest) == set(expect)
    for uid, row in latest.items():
        n, cents = expect[uid]
        assert row.n_events == n, (uid, row.n_events, n)
        assert int(round(row.value_sum * 100)) == cents
