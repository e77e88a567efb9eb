"""Multimodal column plumbing: binary payloads, metadata structs, and
the Arrow-batched decode stub (driver north star; SURVEY.md §7 M5)."""

from __future__ import annotations

import pytest

from pse_stocks_etl_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    real_decode,
)
from pse_stocks_etl_spark.sources.catalog import load_table


def test_attach_binary_schema_and_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary(docs)
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.first()
    assert row.media_meta.modality == "image"
    assert row.media_meta.n_bytes == len(row.payload)
    assert len(row.media_meta.content_md5) == 32


def test_decode_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = decode_features(attach_binary(docs))
    a = sorted(map(tuple, feats.collect()))
    b = sorted(map(tuple, decode_features(attach_binary(docs)).collect()))
    assert a == b  # deterministic fake codec
    assert all(16 <= r[3] <= 2064 and 16 <= r[4] <= 2064 for r in a)  # width/height
    assert len(a) == 50


def test_real_decode_is_marked_stub_for_image_formats():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00")


def test_real_decode_parses_wav_for_real():
    from pse_stocks_etl_spark.operators.multimodal import synth_wav

    feats = real_decode(synth_wav(42))
    n = 64 + 42 % 193
    samples = [((42 * 2654435761 + i * 40503) % 65536) - 32768 for i in range(n)]
    assert feats == {
        "sample_rate": 16000,
        "n_channels": 1,
        "bits_per_sample": 16,
        "n_samples": n,
        "sum_amp": sum(samples),
        "min_amp": min(samples),
        "max_amp": max(samples),
    }


def test_parse_wav_walks_chunks_and_rejects_non_pcm():
    import struct

    from pse_stocks_etl_spark.operators.multimodal import parse_wav, synth_wav

    wav = synth_wav(7)
    assert b"LIST" in wav  # the synth inserts a chunk between fmt and data,
    # so a fixed-offset (44-byte-header) reader would misparse; parse_wav
    # must walk the chunk list to pass the golden test above.
    with pytest.raises(ValueError):
        parse_wav(b"RIFX" + wav[4:])  # bad magic
    with pytest.raises(ValueError):
        parse_wav(wav[:12])  # no fmt/data chunks
    # IEEE-float WAV (format code 3) must be rejected, not guessed at
    float_fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    bad = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + float_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        parse_wav(bad)


def test_decode_wav_distributed_matches_local_parse(spark, sf_dir):
    from pse_stocks_etl_spark.operators.multimodal import (
        attach_wav,
        decode_wav,
        parse_wav,
        synth_wav,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    out = {r.doc_id: r.asDict() for r in decode_wav(attach_wav(docs)).collect()}
    assert len(out) == 30
    for doc_id, row in out.items():
        expect = parse_wav(synth_wav(doc_id))
        assert {k: row[k] for k in expect} == expect


def test_resize_media_composes_and_is_deterministic(spark, sf_dir):
    from pse_stocks_etl_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents").limit(20)
    resized = resize_media(attach_binary(docs), width=8, height=8)
    rows = {r.doc_id: r for r in resized.collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert len(r.payload) == 8 * 8 * 3  # exact target byte count
        assert r.media_meta.n_bytes == 8 * 8 * 3
        assert (r.media_meta.width, r.media_meta.height) == (8, 8)
    again = {r.doc_id: r for r in resize_media(attach_binary(docs), 8, 8).collect()}
    assert all(bytes(rows[d].payload) == bytes(again[d].payload) for d in rows)
    # composes: the resized frame decodes through the same feature pass
    feats = decode_features(resized.select(
        "doc_id", "payload",
        resized.media_meta.dropFields("width", "height").alias("media_meta")))
    assert feats.count() == 20


def test_sample_frames_expansion_and_stride(spark, sf_dir):
    from pse_stocks_etl_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_binary(docs)
    frames = sample_frames(media, frame_bytes=64, every_k=4).collect()
    n_docs = media.count()
    assert len(frames) > n_docs  # 1 -> N expansion actually happened
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    sizes = {r.media_meta.n_bytes for r in media.select("media_meta").collect()}
    assert min(sizes) >= 64  # docs long enough to have frames
    for doc_id, rows in by_doc.items():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(0, 4 * len(idxs), 4))  # stride-4 sampling
        assert all(len(r.frame) == 64 for r in rows)  # only full frames
