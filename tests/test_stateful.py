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


def test_event_time_timeout_expires_idle_keys(spark, tmp_path):
    """Event-time state expiry: a key idle past the horizon is emitted
    once more with expired=True and its state removed (a later event
    starts it FRESH) — the mechanism that bounds the state store to
    O(active keys) on unbounded key spaces. Driven deterministically by
    the WATERMARK (file micro-batches), never wall clock."""
    import os
    import uuid

    from pse_stocks_etl_spark.streaming.incremental import stream_events

    HOUR = 3_600 * 10**6  # micros
    T0 = 1_700_000_000 * 10**6

    def batch(*specs):
        return spark.createDataFrame(
            [
                (eid, T0 + int(h * HOUR), uid, "click", 1.0, "{}")
                for eid, h, uid in specs
            ],
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )

    batches = [
        # user 1: two events; user 9 rides along in every batch to
        # advance the watermark (delay 1h) past 1's 30-min horizon.
        batch((1, 0.0, 1), (2, 0.2, 1), (3, 0.0, 9)),
        # watermark after b0 = T0-1h; b1 pushes it to T0+3h > 1's expiry
        batch((4, 4.0, 9)),
        # user 1 returns AFTER expiry: state must have been removed
        batch((5, 8.0, 1), (6, 8.0, 9)),
    ]
    src = str(tmp_path / "expire_src")
    os.makedirs(src)
    name = f"expire_{uuid.uuid4().hex[:8]}"
    q = None
    per_batch = []
    try:
        for i, b in enumerate(batches):
            b.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
            if q is None:
                events = stream_events(spark, src + "/*").withWatermark(
                    "ts", "1 hour"
                )
                stats = running_user_stats(
                    events, expire_after_ms=30 * 60 * 1000
                )
                q = (
                    stats.writeStream.outputMode("update")
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", str(tmp_path / "ck_expire"))
                    .start()
                )
            q.processAllAvailable()
            per_batch.append(
                [
                    (r.user_id, r.n_events, r.expired)
                    for r in spark.table(name).collect()[len(sum(per_batch, [])):]
                ]
            )
    finally:
        if q is not None:
            q.stop()

    assert sorted(per_batch[0]) == [(1, 2, False), (9, 1, False)]
    # batch 1: user 1's state expired (tombstone), user 9 keeps counting
    assert sorted(per_batch[1]) == [(1, 2, True), (9, 2, False)]
    # batch 2: user 1 restarts FRESH (n=1, not 3) — state really gone
    assert sorted(per_batch[2]) == [(1, 1, False), (9, 3, False)]
