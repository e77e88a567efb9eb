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


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00")
