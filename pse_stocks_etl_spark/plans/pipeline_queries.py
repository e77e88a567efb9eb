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

from ..operators.multimodal import attach_binary, decode_features
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
