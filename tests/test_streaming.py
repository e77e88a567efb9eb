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


def test_stream_stream_join_across_microbatches(spark, sf_dir, tmp_path):
    """The watermarked interval join must buffer click state across
    micro-batch boundaries: a click delivered in micro-batch 1 joins a
    purchase delivered in micro-batch 2, and the final pair set equals
    the batch join of the union."""
    import uuid

    from pse_stocks_etl_spark.streaming.incremental import interval_join_clicks

    HOUR = 3_600 * 10**6  # micros — fixtures carry the driver files' unit
    T0 = 1_700_000_000 * 10**6

    def rows(*specs):
        # Written as TIMESTAMP_NTZ → parquet TIMESTAMP(MICROS), the same
        # physical type as /root/testdata's events.parquet, so the unit
        # probe in stream_events sees what production sees.
        return spark.createDataFrame(
            [
                (eid, T0 + int(h * HOUR), uid, etype, 1.0, "{}")
                for eid, h, uid, etype in specs
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
        # click c1 buffers for the cross-batch pair; (c2, p2) pair in-batch;
        # the 10:30 view sets batch-0 max event time (watermark = 09:30).
        rows((1, 0.0, 1, "click"), (2, 0.0, 2, "click"),
             (3, 0.08, 2, "purchase"), (4, 0.5, 9, "view")),
        # purchase for user 1 lands two hours later, in the next batch.
        rows((5, 2.0, 1, "purchase"), (6, 9.0, 9, "view")),
    ]

    src = str(tmp_path / "join_src")
    os.makedirs(src)
    q = None
    name = f"ssjoin_out_{uuid.uuid4().hex[:8]}"
    counts = []
    try:
        for i, b in enumerate(batches):
            b.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"batch_{i}")
            )
            if q is None:
                joined = interval_join_clicks(stream_events(spark, src + "/*"))
                q = (
                    joined.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", str(tmp_path / "ck_ssj"))
                    .start()
                )
            q.processAllAvailable()
            counts.append(spark.table(name).count())
    finally:
        if q is not None:
            q.stop()

    got = {
        (r.click_id, r.purchase_id) for r in spark.table(name).collect()
    }
    # Batch reference: the same operator on the unioned batch frame
    # (withWatermark is a no-op in batch execution).
    union = batches[0].unionAll(batches[1])
    expected = {
        (r.click_id, r.purchase_id)
        for r in interval_join_clicks(union).collect()
    }
    assert got == expected == {(2, 3), (1, 5)}
    # The cross-boundary pair (1, 5) appeared only after micro-batch 2.
    assert counts == [1, 2]


def test_foreach_batch_merge_recovers_from_checkpoint(spark, sf_dir, tmp_path):
    """Crash-recovery exactly-once: a stream is stopped after one file,
    then a NEW query restarts from the same checkpoint, picks up only
    the unseen file, and the merged table holds every row exactly once.
    The checkpoint (not the sink) carries the progress state — the
    production recovery path for the foreachBatch merge sink."""
    from pse_stocks_etl_spark.streaming.incremental import foreach_batch_merge

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
    ck = str(tmp_path / "ck_recover")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    halves = [
        raw.filter(F.col("event_id") % 2 == 0),
        raw.filter(F.col("event_id") % 2 == 1),
    ]
    src = str(tmp_path / "recover_src")
    os.makedirs(src)

    def start():
        events = stream_events(spark, src + "/*").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        return foreach_batch_merge(
            events, table, keys=("event_id",), freshness_col="ts", checkpoint=ck
        )

    halves[0].coalesce(1).write.parquet(os.path.join(src, "b0"))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n0 = table.read().count()
    assert n0 == halves[0].count()

    # "Crash" happened; a fresh query resumes from the same checkpoint.
    halves[1].coalesce(1).write.parquet(os.path.join(src, "b1"))
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert table.read().count() == raw.count()  # every row exactly once
    # event_ids unique — no replayed duplicates slipped past the merge
    assert table.read().select("event_id").distinct().count() == raw.count()


def test_session_state_merges_across_microbatches(spark, tmp_path):
    """Mergeable session state: two events of one user 10 minutes apart
    (inside the 30-minute gap) delivered in SEPARATE micro-batches must
    come out as ONE session — the runtime merges the open session state
    when the second event arrives. A third event far outside the gap
    opens a fresh session."""
    import uuid

    from pse_stocks_etl_spark.streaming.incremental import (
        sessionized_event_counts,
        stream_events,
    )

    MIN = 60 * 10**6  # micros
    T0 = 1_700_000_000 * 10**6

    def rows(*specs):
        return spark.createDataFrame(
            [
                (eid, T0 + int(m * MIN), uid, "click", 1.0, "{}")
                for eid, m, uid in specs
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
        rows((1, 0.0, 1)),            # opens session A
        rows((2, 10.0, 1)),           # within gap -> must MERGE into A
        rows((3, 120.0, 1)),          # far outside gap -> session B
    ]
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    name = f"sess_merge_{uuid.uuid4().hex[:8]}"
    q = None
    try:
        for i, b in enumerate(batches):
            b.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
            if q is None:
                agg = sessionized_event_counts(stream_events(spark, src + "/*"))
                q = (
                    agg.writeStream.outputMode("complete")
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", str(tmp_path / "ck_sess"))
                    .start()
                )
            q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    got = {
        (r.user_id, r.n, r.sum_value) for r in spark.table(name).collect()
    }
    assert got == {(1, 2, 2.0), (1, 1, 1.0)}  # merged A (2 events) + B


def test_foreach_batch_cms_converges_to_batch_sketch(spark, sf_dir, tmp_path):
    """Incremental Count-Min upkeep: streaming the events in two files
    through foreach_batch_cms yields EXACTLY the counters of a one-shot
    batch sketch — linearity makes the table batching-invariant — and
    the table stays d*w rows regardless of how many keys flowed."""
    from pse_stocks_etl_spark.functions.text import portable_hash64
    from pse_stocks_etl_spark.streaming.incremental import foreach_batch_cms

    d, w = 4, 64
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "cms_src")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "b")
    )
    schema = T.StructType(
        [
            T.StructField("r", T.IntegerType()),
            T.StructField("col", T.LongType()),
            T.StructField("c", T.LongType()),
        ]
    )
    table = ParquetTable(spark, str(tmp_path / "cms_table"), schema)
    table.init_empty()
    events = stream_events(spark, src + "/*")
    q = foreach_batch_cms(
        events, table, d=d, w=w, checkpoint=str(tmp_path / "ck_cms")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.r, r.col): r.c for r in table.read().collect()}
    expected_keyed = ev.select(
        F.col("user_id").cast("string").alias("k"),
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    ).select(
        "r",
        F.pmod(
            portable_hash64(
                F.concat(F.lit("cms:"), F.col("r").cast("string"),
                         F.lit(":"), F.col("k"))
            ),
            F.lit(w),
        ).alias("col"),
    )
    expected = {
        (r.r, r.col): r.c
        for r in expected_keyed.groupBy("r", "col")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == expected
    assert len(got) <= d * w  # bounded no matter the key cardinality


def test_late_data_beyond_watermark_is_dropped(spark, tmp_path):
    """Watermark contract, observed end-to-end in append mode: a row
    arriving AFTER the watermark passed its window's end must not
    reopen the finalized window (its count stays at the on-time value),
    while a late-but-within-watermark row is folded in. This is the
    T2-lookback analog on the native streaming runtime: bounded
    lateness is absorbed, unbounded lateness is dropped."""
    import uuid

    from pse_stocks_etl_spark.streaming.incremental import windowed_event_counts

    HOUR = 3_600 * 10**6
    # hour-ALIGNED epoch so window_start - T0 is a whole hour count
    T0 = 1_699_999_200 * 10**6

    def rows(*specs):
        return spark.createDataFrame(
            [
                (eid, T0 + int(h * HOUR), uid, etype, 1.0, "{}")
                for eid, h, uid, etype in specs
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
        # on-time row in window W0 [0,1h); the 3.5h row advances the
        # watermark to 1.5h > W0's end -> W0 finalizes with n=1
        rows((1, 0.2, 1, "click"), (2, 3.5, 1, "click")),
        # e3: W0 again but watermark has passed W0's end -> DROPPED;
        # e4: window W2 [2h,3h), >= watermark 1.5h -> accepted;
        # e5: advances watermark to 4h -> finalizes W2 (n must be 1)
        rows((3, 0.5, 1, "click"), (4, 2.2, 1, "click"), (5, 6.0, 1, "click")),
    ]

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    from pse_stocks_etl_spark.streaming.incremental import stream_events

    name = f"late_out_{uuid.uuid4().hex[:8]}"
    q = None
    try:
        for i, batch in enumerate(batches):
            batch.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i}")
            )
            if q is None:
                events = stream_events(spark, os.path.join(src, "b*"))
                agg = windowed_event_counts(events)
                q = (
                    agg.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", str(tmp_path / "ck_late"))
                    .start()
                )
            q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()

    out = {
        int((r.window_start.timestamp() * 10**6 - T0) // HOUR): r.n
        for r in spark.table(name).collect()
    }
    assert out.get(0) == 1, f"late row reopened W0: {out}"  # e3 dropped
    assert out.get(2) == 1, f"within-watermark row lost: {out}"  # e4 kept


def test_full_outer_join_emits_both_null_sides_on_watermark(spark, tmp_path):
    """FULL OUTER stream-stream interval join: a never-converting click
    and a click-less purchase stay BUFFERED while a future match is
    still possible, and both NULL rows emit only once the watermark
    proves no match can come — the click at click_ts + window, the
    purchase at purchase_ts (the interval is one-sided). Matched pairs
    emit as they are processed."""
    import uuid

    from pse_stocks_etl_spark.streaming.incremental import interval_join_clicks

    HOUR = 3_600 * 10**6
    T0 = 1_700_000_000 * 10**6

    def rows(*specs):
        return spark.createDataFrame(
            [
                (eid, T0 + int(h * HOUR), uid, etype, 1.0, "{}")
                for eid, h, uid, etype in specs
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
        # c1 never converts; p2 has no preceding click; (c3, p4) match
        # in-batch. The watermark is computed AFTER the click/purchase
        # filters, so only click/purchase event times advance it —
        # batch 0 leaves it at 23:00 the previous day (max 0.5h - 1h
        # delay): NOTHING is provably unmatched yet.
        rows((1, 0.0, 1, "click"), (2, 0.5, 2, "purchase"),
             (3, 0.2, 3, "click"), (4, 0.3, 3, "purchase")),
        # a 9:00 click and purchase for unrelated users push BOTH
        # sides' watermarks to 08:00 — past c1's horizon (00:00 + 6h)
        # AND past p2's own timestamp: both NULL rows must flush. The
        # 9:00 rows themselves stay buffered (their own horizons are
        # still open) and never emit.
        rows((6, 9.0, 8, "click"), (7, 9.0, 9, "purchase")),
    ]

    src = str(tmp_path / "fjoin_src")
    os.makedirs(src)
    q = None
    name = f"fsjoin_out_{uuid.uuid4().hex[:8]}"
    counts = []
    try:
        for i, b in enumerate(batches):
            b.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"batch_{i}")
            )
            if q is None:
                joined = interval_join_clicks(
                    stream_events(spark, src + "/*"), join_type="full_outer"
                )
                q = (
                    joined.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", str(tmp_path / "ck_fsj"))
                    .start()
                )
            q.processAllAvailable()
            counts.append(spark.table(name).count())
    finally:
        if q is not None:
            q.stop()

    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.table(name).collect()
    }
    assert got == {(3, 3, 4), (1, 1, None), (2, None, 2)}
    # only the matched pair before the watermark advanced; both NULL
    # sides flushed once batch 1 moved the watermark; the 9:00 rows
    # stay buffered (no row for users 8/9)
    assert counts == [1, 3]


def test_outer_join_one_sided_stream_emits_nothing(spark, tmp_path):
    """A stream with clicks but ZERO purchases: the purchase-side
    watermark never advances, so no click is ever provably unmatched
    and the outer join emits nothing — and the oracle's wm guard
    (NULL when either side is empty) agrees by construction. Pins the
    one-sided divergence the r6 review found latent in the least()
    watermark."""
    import uuid

    from pse_stocks_etl_spark.streaming.incremental import interval_join_clicks

    HOUR = 3_600 * 10**6
    T0 = 1_700_000_000 * 10**6
    rows = spark.createDataFrame(
        [(1, T0, 1, "click", 1.0, "{}"), (2, T0 + 20 * HOUR, 8, "click", 1.0, "{}")],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn(
        "ts",
        F.expr("timestampadd(MICROSECOND, ts, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
    )
    src = str(tmp_path / "oneside_src")
    os.makedirs(src)
    rows.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    name = f"oneside_{uuid.uuid4().hex[:8]}"
    joined = interval_join_clicks(
        stream_events(spark, src + "/*"), join_type="left_outer"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck_oneside"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table(name).count() == 0


def test_streaming_plan_digests_are_captured(spark, sf_dir):
    # r9 VERDICT item 4: BENCH_DETAIL read e0s0w0j0 for every streaming
    # headliner because the digest harness only walked the returned
    # batch frame. The runners now record the last micro-batch's
    # executed-plan digest; each headliner must produce a NON-vacuous
    # digest whose stateful operators match its shape (stream-stream
    # joins -> j >= 1; windowed/dedup aggs -> state stores t >= 1).
    import re

    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans import pipeline_queries as pq

    expectations = {
        "streaming_hourly_counts": lambda d: d["t"] >= 1 and d["e"] >= 1,
        "streaming_click_semi_join": lambda d: d["j"] >= 1,
        "streaming_click_outer_join": lambda d: d["j"] >= 1,
        "streaming_late_drop_counts": lambda d: d["t"] >= 1,
    }
    for name, ok in expectations.items():
        pq.LAST_STREAM_PLAN_DIGEST = None
        plans.REGISTRY[name].fn(spark, sf_dir)  # fn drives the stream
        digest = pq.LAST_STREAM_PLAN_DIGEST
        assert digest is not None, f"{name}: no streaming digest recorded"
        parts = dict(
            zip("eswjt", (int(x) for x in re.findall(r"\d+", digest)))
        )
        assert ok(parts), (name, digest)
