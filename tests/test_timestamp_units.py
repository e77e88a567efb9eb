"""Parquet timestamp-unit hardening (round-4 verdict item 4).

The round-4 regression: `stream_events` hard-declared `ts` as a nanos
long while the driver's files store TIMESTAMP(MICROS), silently
compressing the timeline 1000×. These tests pin the invariant that
killed it: the SAME logical data stored as TIMESTAMP(MICROS) and as
TIMESTAMP(NANOS) must come out IDENTICAL through every events read
path — batch (`load_table`) and streaming (`stream_events`) — because
the unit is probed from the file footer, never assumed.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pse_stocks_etl_spark.sources.catalog import load_table
from pse_stocks_etl_spark.streaming.incremental import events_ts_unit, stream_events

N_ROWS = 500


@pytest.fixture(scope="module")
def unit_dirs(sf_dir, tmp_path_factory):
    """Two directories holding the SAME event rows, one with ts stored
    as parquet TIMESTAMP(MICROS) (the driver writer's convention), one
    as TIMESTAMP(NANOS) (the legacy fixture convention)."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet")).slice(0, N_ROWS)
    idx = src.schema.get_field_index("ts")
    ns = src.set_column(
        idx, pa.field("ts", pa.timestamp("ns")), src.column("ts").cast(pa.timestamp("ns"))
    )
    base = tmp_path_factory.mktemp("ts_units")
    dirs = {}
    for name, table in (("us", src), ("ns", ns)):
        d = str(base / name)
        os.makedirs(d)
        # version='2.6' keeps the NANOS logical type (older footers
        # silently downgrade ns to us, which would defeat the test).
        pq.write_table(table, os.path.join(d, "events.parquet"), version="2.6")
        dirs[name] = d
    stored = {
        name: pq.ParquetFile(os.path.join(d, "events.parquet")).schema_arrow.field("ts").type
        for name, d in dirs.items()
    }
    assert stored["us"] == pa.timestamp("us")
    assert stored["ns"] == pa.timestamp("ns")
    return dirs


def test_unit_probe_reads_footer_not_assumption(unit_dirs, sf_dir):
    assert events_ts_unit(os.path.join(unit_dirs["us"], "events.parquet")) == "timestamp"
    assert events_ts_unit(os.path.join(unit_dirs["ns"], "events.parquet")) == "long_ns"
    assert events_ts_unit(unit_dirs["us"]) == "timestamp"
    assert events_ts_unit(unit_dirs["ns"]) == "long_ns"
    assert events_ts_unit(unit_dirs["ns"] + "/*") == "long_ns"
    # the real driver files
    assert events_ts_unit(os.path.join(sf_dir, "events.parquet")) in ("timestamp", "long_ns")
    # no files yet → the writer-convention default, not an error
    assert events_ts_unit("/nonexistent/empty_dir") == "timestamp"


def test_batch_read_identical_across_units(spark, unit_dirs):
    frames = {name: load_table(spark, d, "events") for name, d in unit_dirs.items()}
    for df in frames.values():
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    rows = {
        name: sorted((r.event_id, r.ts) for r in df.select("event_id", "ts").collect())
        for name, df in frames.items()
    }
    assert rows["us"] == rows["ns"]
    assert len(rows["us"]) == N_ROWS
    # sanity: the timeline is in the data's actual decade, not 1970
    assert rows["us"][0][1].year >= 2000


def test_stream_read_identical_across_units(spark, unit_dirs):
    rows = {}
    for name, d in unit_dirs.items():
        sink = f"unit_probe_{name}_{uuid.uuid4().hex[:8]}"
        q = (
            stream_events(spark, d)
            .select("event_id", "ts")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows[name] = sorted(
            (r.event_id, r.ts) for r in spark.table(sink).collect()
        )
    assert rows["us"] == rows["ns"]
    assert len(rows["us"]) == N_ROWS
    assert rows["us"][0][1].year >= 2000


def test_unit_probe_rejects_mixed_unit_sources(unit_dirs, tmp_path):
    """One declared stream schema cannot read both units; a mixed
    directory must raise, not silently rescale one subset."""
    import shutil

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    shutil.copy(
        os.path.join(unit_dirs["us"], "events.parquet"), mixed / "a.parquet"
    )
    shutil.copy(
        os.path.join(unit_dirs["ns"], "events.parquet"), mixed / "b.parquet"
    )
    with pytest.raises(ValueError, match="mixed ts physical types"):
        events_ts_unit(str(mixed))
