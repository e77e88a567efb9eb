"""Non-SQL-expressible pipeline queries (rows-only checks): multimodal
decode plumbing, Structured-Streaming aggregation, and the end-to-end
incremental sync engine. The driver records a weaker rows-only check for
these (no oracle_sql entry) — their full semantics are covered by
dedicated pytest suites instead (tests/test_store.py, test_sync.py,
test_streaming.py, test_multimodal.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary, decode_features, sample_frames
from ..sources.catalog import load_table
from .registry import register


@register(
    "multimodal_decode",
    oracle=None,
    tags=("llm", "multimodal", "rows-only"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns + Arrow-batched decode/feature extraction
    (deterministic fake codec; real codec is the marked stub)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(attach_binary(docs))


@register(
    "multimodal_frame_sample",
    # The chunking arithmetic is pure byte slicing, so unlike the codec
    # stub this multimodal op gets a FULL value-hash oracle: DuckDB
    # reproduces every sampled frame from hex(encode(text)).
    oracle="""
    SELECT d.doc_id, u.fi AS frame_idx,
           substr(hex(encode(d.text)), u.fi * 128 + 1, 128) AS frame_hex
    FROM documents d,
         UNNEST(range(0, octet_length(encode(d.text)) // 64, 4)) AS u(fi)
    """,
    tags=("llm", "multimodal", "frame-sample"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media columns: payload → fixed-size
    frame chunks, every 4th frame emitted as its own row (the 1→N
    batch-expansion plumbing a video pipeline needs, executor-side via
    mapInPandas). Frames are compared by hex so the driver hash is
    byte-exact across engines."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary(docs), frame_bytes=64, every_k=4)
    return frames.select(
        "doc_id", "frame_idx", F.hex(F.col("frame")).alias("frame_hex")
    )


@register(
    "streaming_hourly_counts",
    oracle=None,
    tags=("streaming", "rows-only"),
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation executed on the Structured
    Streaming runtime (file source → watermark → tumbling window →
    memory sink), driven to completion synchronously."""
    import os
    import uuid

    from ..streaming.incremental import stream_events, windowed_event_counts

    events = stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    agg = windowed_event_counts(events)
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "sync_end_to_end",
    oracle=None,
    tags=("sync", "rows-only"),
)
def sync_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full incremental engine: initdb → dimension overwrite →
    watermark plan → distributed fetch → dedup → freshness merge; runs
    twice (replay) to exercise T4 idempotency, returns the fact table."""
    from .sync import PseDatasets

    root = tempfile.mkdtemp(prefix="pse_sync_")
    ds = PseDatasets(spark, root)
    ds.initdb()
    ds.sync(today="2024-02-01", lookback_days=30)
    ds.sync(today="2024-02-01", lookback_days=30)  # replay must converge
    return ds.prices.read()
