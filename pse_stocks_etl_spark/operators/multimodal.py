"""Multimodal columns: opaque binary payloads + typed metadata, with
Pandas-UDF decode/feature plumbing (driver north star; SURVEY.md §7 M5).

Design: media travels as `binary` columns with a metadata struct
(modality, byte size, content hash); decode / feature-extraction runs as
Arrow-batched `mapInPandas` so each task processes whole record batches
— the shape that scales to 100 TB of images/audio (per-partition
streaming, no driver involvement, no per-row Python overhead).

The actual codec step is STUBBED: image/audio libraries are not in this
container. `decode_features` computes deterministic byte-level features
(length, hash-derived pseudo-dimensions) so the Spark-side plumbing —
schema, batch shape, partitioning — is real and tested; `real_decode`
marks the integration point and raises NotImplementedError.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("content_md5", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("feature_norm", T.DoubleType(), True),
    ]
)


def attach_binary(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Wrap a text column as an opaque binary payload + metadata struct
    (stand-in for real media ingest; the schema is the contract)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ).alias("media_meta"),
    )


def real_decode(payload: bytes) -> dict:  # pragma: no cover - integration point
    """STUB: the real image/audio decode (PIL / torchaudio / ffmpeg) —
    not available in this container."""
    raise NotImplementedError(
        "media codecs unavailable; deterministic fake used instead (decode_features)"
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' + feature extraction over binary payloads.

    Deterministic fake decoder: pseudo width/height/feature-norm derived
    from the payload's md5 — replace `_fake` with `real_decode` when
    codecs exist. The mapInPandas shape (batch iterator in, batch
    iterator out, explicit output schema) is the production plumbing.
    """

    def _fake(payload: bytes) -> tuple[int, int, float]:
        h = int(hashlib.md5(payload).hexdigest()[:12], 16)
        return 16 + h % 2048, 16 + (h >> 11) % 2048, round((h % 10**6) / 10**6, 6)

    def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "feature_norm": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(decode_partition, schema=FEATURES_SCHEMA)


def real_resize(payload: bytes, w: int, h: int) -> bytes:  # pragma: no cover
    """STUB: the real image resample (PIL.Image.resize) — not available
    in this container."""
    raise NotImplementedError(
        "media codecs unavailable; deterministic fake used instead (resize_media)"
    )


def resize_media(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize pass: binary in → binary out, metadata updated in place —
    the 1:1 media transform shape (same MEDIA_SCHEMA + pixel dims, so
    passes compose: attach → resize → decode). Deterministic fake
    'resample' derives exactly width*height*3 bytes by md5-stretching
    the payload; swap in `real_resize` where codecs exist. Batches
    stream through mapInPandas — payload bytes never visit the driver.
    """
    out_schema = T.StructType(
        MEDIA_SCHEMA.fields[:2]
        + [
            T.StructField(
                "media_meta",
                T.StructType(
                    MEDIA_SCHEMA.fields[2].dataType.fields
                    + [
                        T.StructField("width", T.IntegerType(), True),
                        T.StructField("height", T.IntegerType(), True),
                    ]
                ),
                True,
            )
        ]
    )
    n_out = width * height * 3

    def _fake_resample(payload: bytes) -> bytes:
        out = bytearray()
        seed = payload
        while len(out) < n_out:
            seed = hashlib.md5(seed).digest()
            out.extend(seed)
        return bytes(out[:n_out])

    def resize_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_fake_resample(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "media_meta": [
                        {
                            "modality": m["modality"],
                            "n_bytes": len(r),
                            "content_md5": hashlib.md5(r).hexdigest(),
                            "width": width,
                            "height": height,
                        }
                        for m, r in zip(pdf["media_meta"], resized)
                    ],
                }
            )

    return media.mapInPandas(resize_partition, schema=out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_k: int = 4
) -> DataFrame:
    """Frame sampling: the 1→N expansion shape for video columns. The
    payload is treated as a frame sequence (fixed-size chunks — the
    stubbed stand-in for an ffmpeg demux); every k-th frame is emitted
    as its own row. mapInPandas yields MORE rows than it receives —
    the batch-expansion plumbing a real frame sampler needs — and the
    expansion happens executor-side, so a 100 TB video corpus fans out
    to frames without any driver involvement."""

    def frames_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // frame_bytes, 0)
                for fi in range(0, n_frames, every_k):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(chunk)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames, "frame_md5": hashes}
            )

    return media.mapInPandas(frames_partition, schema=FRAME_SCHEMA)
