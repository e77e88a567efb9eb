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


# ------------------------------------------------------ REAL BMP codec --
def test_bmp_roundtrip_matches_pixel_model():
    """synth → parse: exact channel sums vs an independent numpy model
    of the pixel lattices, across widths that exercise 0/2/3-byte row
    padding."""
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import parse_bmp, synth_bmp

    for doc_id in range(12):
        d = parse_bmp(synth_bmp(doc_id))
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        y, x = np.mgrid[0:h, 0:w]
        assert (d["width"], d["height"], d["n_pixels"]) == (w, h, w * h)
        assert d["sum_b"] == int(((doc_id + 3 * x + 7 * y) % 256).sum())
        assert d["sum_g"] == int(((2 * doc_id + 5 * x + 11 * y) % 256).sum())
        assert d["sum_r"] == int(((3 * doc_id + 13 * x + 17 * y) % 256).sum())


def test_bmp_parses_top_down_storage():
    """Negative biHeight = top-down rows: same image must decode to the
    same aggregates as its bottom-up twin."""
    import struct

    from pse_stocks_etl_spark.operators.multimodal import parse_bmp, synth_bmp

    p = bytearray(synth_bmp(5))
    w, h = parse_bmp(bytes(p))["width"], parse_bmp(bytes(p))["height"]
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    offset = struct.unpack_from("<2sIHHI", p, 0)[4]
    rows = [bytes(p[offset + i * stride : offset + (i + 1) * stride]) for i in range(h)]
    flipped = b"".join(reversed(rows))
    struct.pack_into("<i", p, 14 + 8, -h)  # biHeight := negative (top-down)
    p[offset : offset + stride * h] = flipped
    assert parse_bmp(bytes(p)) == parse_bmp(synth_bmp(5))


def test_bmp_rejects_non_bmp_and_unsupported_depth():
    import struct

    import pytest

    from pse_stocks_etl_spark.operators.multimodal import parse_bmp, synth_bmp

    with pytest.raises(ValueError, match="not a BMP"):
        parse_bmp(b"PNG\x00" * 20)
    p = bytearray(synth_bmp(1))
    struct.pack_into("<H", p, 14 + 14, 8)  # biBitCount := 8
    with pytest.raises(ValueError, match="unsupported BMP encoding"):
        parse_bmp(bytes(p))


def test_bmp_nearest_resize_matches_numpy_model():
    """resize → parse vs gathering the source lattice at the floor
    nearest-neighbor indices ((dst*src)//dst) in pure numpy."""
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import (
        parse_bmp,
        resize_bmp_nearest,
        synth_bmp,
    )

    for doc_id in (0, 3, 7, 11):
        src = parse_bmp(synth_bmp(doc_id))
        w, h = src["width"], src["height"]
        out = parse_bmp(resize_bmp_nearest(synth_bmp(doc_id), 3, 2))
        y, x = np.mgrid[0:h, 0:w]
        chans = {
            "sum_b": (doc_id + 3 * x + 7 * y) % 256,
            "sum_g": (2 * doc_id + 5 * x + 11 * y) % 256,
            "sum_r": (3 * doc_id + 13 * x + 17 * y) % 256,
        }
        xs = (np.arange(3) * w) // 3
        ys = (np.arange(2) * h) // 2
        for k, grid in chans.items():
            assert out[k] == int(grid[np.ix_(ys, xs)].sum()), (doc_id, k)
        assert (out["width"], out["height"]) == (3, 2)


def test_real_decode_dispatches_bmp_and_wav():
    from pse_stocks_etl_spark.operators.multimodal import (
        parse_bmp,
        parse_wav,
        real_decode,
        synth_bmp,
        synth_wav,
    )

    assert real_decode(synth_bmp(4)) == parse_bmp(synth_bmp(4))
    assert real_decode(synth_wav(4)) == parse_wav(synth_wav(4))


def test_bmp_decode_distributed_matches_local(spark, sf_dir):
    """attach_bmp → decode_bmp through mapInPandas equals per-doc local
    parsing — the Arrow plumbing must not reorder, truncate, or coerce
    the payloads."""
    from pse_stocks_etl_spark.operators.multimodal import (
        attach_bmp,
        decode_bmp,
        parse_bmp,
        synth_bmp,
    )
    from pse_stocks_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["sum_b"], r["sum_g"], r["sum_r"])
        for r in decode_bmp(attach_bmp(docs)).collect()
    }
    for doc_id in got:
        d = parse_bmp(synth_bmp(int(doc_id)))
        assert got[doc_id] == (d["width"], d["height"], d["sum_b"], d["sum_g"], d["sum_r"])


# ------------------------------------------------------ REAL Y4M codec --
def test_y4m_roundtrip_matches_luma_model():
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import parse_y4m, synth_y4m

    for doc_id in range(10):
        m = parse_y4m(synth_y4m(doc_id))
        w, h, nf = 2 * (4 + doc_id % 4), 2 * (3 + doc_id % 3), 2 + doc_id % 4
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, nf)
        y, x = np.mgrid[0:h, 0:w]
        sums = [
            int(((doc_id + 2 * x + 5 * y + 31 * t) % 256).sum()) for t in range(nf)
        ]
        assert m["sum_luma"] == sum(sums)
        assert m["min_frame_luma"] == min(sums)
        assert m["max_frame_luma"] == max(sums)


def test_y4m_frame_stride_picks_every_kth():
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import synth_y4m, y4m_frame_stride

    doc_id = 3  # 5 frames
    frames = y4m_frame_stride(synth_y4m(doc_id), every_k=2)
    w, h = 2 * (4 + doc_id % 4), 2 * (3 + doc_id % 3)
    y, x = np.mgrid[0:h, 0:w]
    assert [f["frame_idx"] for f in frames] == [0, 2, 4]
    for f in frames:
        expect = int(((doc_id + 2 * x + 5 * y + 31 * f["frame_idx"]) % 256).sum())
        assert f["luma_sum"] == expect


def test_y4m_rejects_bad_streams():
    import pytest

    from pse_stocks_etl_spark.operators.multimodal import parse_y4m, synth_y4m

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        parse_y4m(b"RIFFxxxx")
    p = synth_y4m(2)
    with pytest.raises(ValueError, match="truncated frame"):
        parse_y4m(p[:-10])
    c444 = p.replace(b"C420", b"C444", 1)
    with pytest.raises(ValueError, match="unsupported chroma"):
        parse_y4m(c444)


def test_y4m_decode_distributed_matches_local(spark, sf_dir):
    from pse_stocks_etl_spark.operators.multimodal import (
        attach_y4m,
        decode_y4m,
        parse_y4m,
        synth_y4m,
    )
    from pse_stocks_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_frames"], r["sum_luma"])
        for r in decode_y4m(attach_y4m(docs)).collect()
    }
    for doc_id in got:
        m = parse_y4m(synth_y4m(int(doc_id)))
        assert got[doc_id] == (m["width"], m["height"], m["n_frames"], m["sum_luma"])


def test_real_decode_dispatches_y4m():
    from pse_stocks_etl_spark.operators.multimodal import (
        parse_y4m,
        real_decode,
        synth_y4m,
    )

    assert real_decode(synth_y4m(6)) == parse_y4m(synth_y4m(6))


# --------------------------------------------------------------------------
# PNG (compressed, stdlib zlib)
# --------------------------------------------------------------------------
def test_png_roundtrip_matches_lattice_model():
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import parse_png, synth_png

    for d in (0, 3, 7, 19):
        info = parse_png(synth_png(d))
        w, h = 6 + d % 5, 5 + d % 4
        y, x = np.mgrid[0:h, 0:w]
        assert info == {
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "sum_r": int(((d + 3 * x + 7 * y) % 256).sum()),
            "sum_g": int(((2 * d + 5 * x + 11 * y) % 256).sum()),
            "sum_b": int(((3 * d + 13 * x + 17 * y) % 256).sum()),
        }


def test_png_every_filter_type_is_exercised_and_decoded():
    """The synthesizer cycles filter (doc_id + y) % 5 and every image
    has >= 5 rows, so a single payload carries all five filters; a
    decoder shortcut (filter-0-only) could not round-trip it. Verify
    the filter bytes really differ inside the DEFLATE stream."""
    import struct
    import zlib

    from pse_stocks_etl_spark.operators.multimodal import parse_png, synth_png

    payload = synth_png(11)
    # walk to the IDAT chunk and inflate
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        length, tag = struct.unpack_from(">I4s", payload, pos)
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    stream = zlib.decompress(idat)
    w, h = 6 + 11 % 5, 5 + 11 % 4
    row = w * 3 + 1
    filters = {stream[y * row] for y in range(h)}
    assert filters == {0, 1, 2, 3, 4}
    parse_png(payload)  # and the full suite decodes


def test_png_rejects_corruption_loudly():
    import pytest

    from pse_stocks_etl_spark.operators.multimodal import parse_png, synth_png

    good = bytearray(synth_png(5))
    with pytest.raises(ValueError, match="not a PNG"):
        parse_png(b"\x89PNJ" + bytes(good[4:]))
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch|unsupported|length"):
        parse_png(bytes(flipped))
    with pytest.raises(ValueError, match="missing IHDR/IDAT/IEND"):
        parse_png(good[:8])
    # truncation ANYWHERE must raise ValueError, never struct.error —
    # in particular inside a chunk's trailing 4-byte CRC (ADVICE r7:
    # the body-length guard alone let the CRC read run past the buffer)
    for cut in range(8, len(good)):
        with pytest.raises(ValueError):
            parse_png(bytes(good[:cut]))
    # 16-bit depth is declared unsupported, not mis-decoded (rebuild
    # the IHDR with depth=16 and a fresh CRC so only depth differs)
    import struct
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 6, 5, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    bad_depth = bytes(good[:8]) + chunk + bytes(good[8 + 12 + 13 :])
    with pytest.raises(ValueError, match="unsupported PNG encoding"):
        parse_png(bad_depth)


def test_png_decode_distributed_matches_local(spark, sf_dir):
    from pse_stocks_etl_spark.operators.multimodal import (
        attach_png,
        decode_png,
        parse_png,
        synth_png,
    )
    from pse_stocks_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in decode_png(attach_png(docs)).collect()
    }
    for doc_id in got:
        m = parse_png(synth_png(int(doc_id)))
        assert got[doc_id] == (
            m["width"],
            m["height"],
            m["sum_r"],
            m["sum_g"],
            m["sum_b"],
        )


def test_real_decode_dispatches_png():
    from pse_stocks_etl_spark.operators.multimodal import (
        parse_png,
        real_decode,
        synth_png,
    )

    assert real_decode(synth_png(9)) == parse_png(synth_png(9))


# --------------------------------------------------------------------------
# JPEG (baseline SOF0, canonical Huffman + numpy IDCT)
# --------------------------------------------------------------------------
def test_jpeg_roundtrip_matches_block_lattice_model():
    from pse_stocks_etl_spark.operators.multimodal import parse_jpeg, synth_jpeg

    for d in (0, 1, 2, 3, 4, 5, 11, 42, 999):
        info = parse_jpeg(synth_jpeg(d))
        bw, bh = 2 + d % 3, 2 + d % 2
        exp = 64 * sum(
            (7 * d + 13 * bx + 31 * by) % 256
            for bx in range(bw)
            for by in range(bh)
        )
        assert info == {
            "width": 8 * bw,
            "height": 8 * bh,
            "n_pixels": 64 * bw * bh,
            "sum_r": exp,
            "sum_g": exp,
            "sum_b": exp,
        }


def test_jpeg_entropy_segment_is_byte_stuffed_and_framed():
    """The stream must be a real JFIF container: SOI/EOI framing, four
    DHTs, two DQTs, and any 0xFF inside the entropy segment stuffed
    with 0x00 (otherwise a conforming decoder would see a marker)."""
    from pse_stocks_etl_spark.operators.multimodal import synth_jpeg

    for d in range(64):
        p = synth_jpeg(d)
        assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
        assert p.count(b"\xff\xc4") == 4 and p.count(b"\xff\xdb") == 2
        # entropy segment = between end of SOS header and EOI
        sos = p.index(b"\xff\xda")
        seglen = int.from_bytes(p[sos + 2 : sos + 4], "big")
        entropy = p[sos + 2 + seglen : -2]
        i = 0
        while i < len(entropy):
            if entropy[i] == 0xFF:
                assert entropy[i + 1] == 0x00, "unstuffed 0xFF in scan"
                i += 2
            else:
                i += 1


def test_jpeg_byte_stuffing_roundtrips_through_writer_and_reader():
    """The synth corpus's short DC+EOB streams never happen to hit an
    0xFF entropy byte, so drive the stuffing path explicitly: a cat-11
    DC code ('111111110' canonically) forces a leading 0xFF byte. The
    writer must stuff it, the reader must unstuff it, and a full
    hand-built grayscale stream containing it must decode."""
    import struct

    from pse_stocks_etl_spark.operators.multimodal import (
        _JPG_AC_BITS,
        _JPG_AC_VALS,
        _JPG_DC_BITS,
        _JPG_DC_VALS,
        _jpg_canonical_codes,
        _jpg_encode_coeff,
        _JpgBitReader,
        _JpgBitWriter,
        _jpg_segment,
        parse_jpeg,
    )

    w = _JpgBitWriter()
    w.write(0xFF, 8)
    assert bytes(w.buf) == b"\xff\x00"
    r = _JpgBitReader(b"\xff\x00\x80", 0)
    assert r.bits(8) == 0xFF and r.bit() == 1

    dc_codes = _jpg_canonical_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _jpg_canonical_codes(_JPG_AC_BITS, _JPG_AC_VALS)
    w = _JpgBitWriter()
    _jpg_encode_coeff(w, dc_codes, 1024)  # cat 11 -> code 0b111111110
    ln, code = ac_codes[0x00]
    w.write(code, ln)
    entropy = w.flush()
    assert b"\xff\x00" in entropy  # the stuffed byte is really there

    q = bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    sos = struct.pack(">B", 1) + struct.pack(">BB", 1, 0x00) + bytes([0, 63, 0])
    payload = (
        b"\xff\xd8"
        + _jpg_segment(0xDB, bytes([0x00]) + q)
        + _jpg_segment(0xC0, sof)
        + _jpg_segment(
            0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS) + bytes(_JPG_DC_VALS)
        )
        + _jpg_segment(
            0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS)
        )
        + _jpg_segment(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    info = parse_jpeg(payload)
    # DC 1024 with q=1 -> constant 1024/8 + 128 = 256, clipped to 255
    assert info["sum_r"] == 64 * 255


def test_jpeg_ac_runlength_path_decodes_hand_built_stream():
    """The synthesizer only emits DC+EOB, so drive the AC path (run
    skips, ZRL, EXTEND of negative levels) with a hand-built grayscale
    stream and check against a directly computed IDCT reference."""
    import struct

    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import (
        _JPG_AC_BITS,
        _JPG_AC_VALS,
        _JPG_DC_BITS,
        _JPG_DC_VALS,
        _JPG_ZIGZAG,
        _jpg_canonical_codes,
        _jpg_encode_coeff,
        _jpg_idct_matrix,
        _JpgBitWriter,
        _jpg_segment,
        parse_jpeg,
    )

    dc_codes = _jpg_canonical_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _jpg_canonical_codes(_JPG_AC_BITS, _JPG_AC_VALS)
    w = _JpgBitWriter()
    # one 8x8 grayscale block: DC = 5, AC at zigzag k=2 -> level -1,
    # then ZRL (16 zeros), then AC at k=19 -> level +1, then EOB
    _jpg_encode_coeff(w, dc_codes, 5)
    ln, code = ac_codes[0x11]  # run 1, size 1 -> lands at k=2
    w.write(code, ln)
    w.write(0, 1)  # size-1 bits '0' EXTENDs to -1
    ln, code = ac_codes[0xF0]  # ZRL
    w.write(code, ln)
    ln, code = ac_codes[0x01]  # run 0, size 1 -> k=19
    w.write(code, ln)
    w.write(1, 1)  # '1' EXTENDs to +1
    ln, code = ac_codes[0x00]  # EOB
    w.write(code, ln)
    entropy = w.flush()

    q = bytes([1] * 64)  # identity quant so coefficients pass through
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    sos = struct.pack(">B", 1) + struct.pack(">BB", 1, 0x00) + bytes([0, 63, 0])
    payload = (
        b"\xff\xd8"
        + _jpg_segment(0xDB, bytes([0x00]) + q)
        + _jpg_segment(0xC0, sof)
        + _jpg_segment(
            0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS) + bytes(_JPG_DC_VALS)
        )
        + _jpg_segment(
            0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS)
        )
        + _jpg_segment(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )
    info = parse_jpeg(payload)
    coeffs = np.zeros(64)
    coeffs[0] = 5.0
    coeffs[_JPG_ZIGZAG[2]] = -1.0
    coeffs[_JPG_ZIGZAG[19]] = 1.0
    m = _jpg_idct_matrix()
    ref = np.clip(np.round(m.T @ coeffs.reshape(8, 8) @ m + 128.0), 0, 255)
    assert info["width"] == 8 and info["height"] == 8
    assert info["sum_r"] == info["sum_g"] == info["sum_b"] == int(ref.sum())


def test_jpeg_rejects_corruption_loudly():
    import pytest

    from pse_stocks_etl_spark.operators.multimodal import parse_jpeg, synth_jpeg

    good = synth_jpeg(7)
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_jpeg(b"\xff\xd9" + good[2:])
    # progressive SOF must be declared unsupported, not mis-decoded
    with pytest.raises(ValueError, match="non-baseline SOF"):
        parse_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # subsampling rejected (flip Y's sampling byte 0x11 -> 0x22)
    sof_at = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof_at + 11] = 0x22
    with pytest.raises(ValueError, match="subsampling"):
        parse_jpeg(bytes(bad))
    # truncation ANYWHERE raises ValueError, never struct/IndexError
    for cut in range(2, len(good)):
        with pytest.raises(ValueError):
            parse_jpeg(good[:cut])


def test_jpeg_decode_distributed_matches_local(spark, sf_dir):
    from pse_stocks_etl_spark.operators.multimodal import (
        attach_jpeg,
        decode_jpeg,
        parse_jpeg,
        synth_jpeg,
    )
    from pse_stocks_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in decode_jpeg(attach_jpeg(docs)).collect()
    }
    assert got
    for doc_id in got:
        m = parse_jpeg(synth_jpeg(int(doc_id)))
        assert got[doc_id] == (
            m["width"],
            m["height"],
            m["sum_r"],
            m["sum_g"],
            m["sum_b"],
        )


def test_real_decode_dispatches_jpeg():
    from pse_stocks_etl_spark.operators.multimodal import (
        parse_jpeg,
        real_decode,
        synth_jpeg,
    )

    p = synth_jpeg(3)
    assert real_decode(p) == parse_jpeg(p)


# ---------------------------------------------------------------------------
# GIF: REAL LZW codec
# ---------------------------------------------------------------------------


def test_gif_lzw_roundtrips_including_table_overflow():
    import random

    from pse_stocks_etl_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(7)
    cases = [
        b"",
        b"\x00",
        bytes(rng.randrange(256) for _ in range(5000)),
        b"\x00" * 100_000,  # long runs: KwKwK path every step
        bytes(range(256)) * 400,  # cycling roots: steady table growth
        bytes((i * i) % 251 for i in range(60_000)),  # forces 4096 reset
    ]
    for data in cases:
        assert _gif_lzw_decode(_gif_lzw_encode(data), 8) == data
    # sub-byte code sizes (GIF supports palettes down to 2 colors)
    for mcs in (2, 4, 6):
        data = bytes(rng.randrange(1 << mcs) for _ in range(3000))
        assert _gif_lzw_decode(_gif_lzw_encode(data, mcs), mcs) == data


def test_gif_lzw_rejects_malformed_streams():
    import pytest

    from pse_stocks_etl_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    good = _gif_lzw_encode(b"hello world" * 10)
    with pytest.raises(ValueError, match="truncated"):
        _gif_lzw_decode(good[:-2], 8)  # EOI cut off
    # first code after CLEAR must be a root: craft clear(256) then 300
    # (9-bit codes LSB-first: 256 = 0x100, then 300)
    acc = 256 | (300 << 9)
    bad = bytes((acc >> (8 * i)) & 0xFF for i in range(3))
    with pytest.raises(ValueError, match="bad first LZW code"):
        _gif_lzw_decode(bad, 8)
    # code far beyond the table: clear, root 0, then 4000
    acc = 256 | (0 << 9) | (4000 << 18)
    bad = bytes((acc >> (8 * i)) & 0xFF for i in range(4))
    with pytest.raises(ValueError, match="out of range"):
        _gif_lzw_decode(bad, 8)


def test_gif_roundtrip_matches_pixel_lattice_model():
    import numpy as np

    from pse_stocks_etl_spark.operators.multimodal import parse_gif, synth_gif

    for d in list(range(12)) + [101, 250, 333, 499]:
        got = parse_gif(synth_gif(d))
        w, h = 5 + d % 6, 4 + d % 5
        y, x = np.mgrid[0:h, 0:w]
        i = (11 * d + 37 * x + 59 * y) % 256
        r, g, b = (7 * i + 13) % 256, (11 * i + 5) % 256, (13 * i + 3) % 256
        wgt = 1 + x + 7 * y
        assert got == {
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "interlaced": d % 2 == 1,
            "sum_r": int(r.sum()),
            "sum_g": int(g.sum()),
            "sum_b": int(b.sum()),
            "wsum_r": int((wgt * r).sum()),
            "wsum_g": int((wgt * g).sum()),
            "wsum_b": int((wgt * b).sum()),
        }


def test_gif_interlace_actually_permutes_rows_on_the_wire():
    """The interlaced payload must store rows in pass order — if the
    encoder wrote them naturally the de-interlace test above would be
    vacuous. Decode doc 1's raster WITHOUT de-interlacing by flipping
    the interlace flag bit and check the weighted sums DIFFER."""
    from pse_stocks_etl_spark.operators.multimodal import parse_gif, synth_gif

    p = bytearray(synth_gif(1))  # odd -> interlaced, h=5: passes differ
    # image descriptor starts after 6 (header) + 7 (LSD) + 768 (GCT)
    desc = 6 + 7 + 768
    assert p[desc] == 0x2C
    packed_at = desc + 9
    assert p[packed_at] & 0x40
    straight = parse_gif(bytes(p))
    p[packed_at] &= ~0x40  # lie: claim non-interlaced
    lied = parse_gif(bytes(p))
    assert straight["sum_r"] == lied["sum_r"]  # plain sums are blind
    assert straight["wsum_r"] != lied["wsum_r"]  # weighted sums are not


def test_gif_skips_extensions_and_honors_local_color_table():
    import struct

    from pse_stocks_etl_spark.operators.multimodal import (
        _gif_lzw_encode,
        _gif_subblocks,
        parse_gif,
    )

    # hand-build: header, LSD with NO global table, a graphic-control
    # extension, an image with a 4-entry LOCAL table, 2x2 raster
    lsd = struct.pack("<HH", 2, 2) + bytes((0x00, 0, 0))
    ext = b"\x21\xf9" + bytes((4,)) + b"\x00\x00\x00\x00" + b"\x00"
    lct = bytes(
        (10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    )  # entries 0..3
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + bytes((0x81,))  # LCT, 4
    raster = bytes((0, 1, 2, 3))
    data = bytes((2,)) + _gif_subblocks(_gif_lzw_encode(raster, 2))
    payload = b"GIF89a" + lsd + ext + desc + lct + data + b"\x3b"
    got = parse_gif(payload)
    assert got["width"] == 2 and got["height"] == 2
    assert got["sum_r"] == 10 + 40 + 70 + 100
    assert got["sum_g"] == 20 + 50 + 80 + 110
    assert got["sum_b"] == 30 + 60 + 90 + 120


def test_gif_rejects_corruption_loudly():
    import pytest

    from pse_stocks_etl_spark.operators.multimodal import parse_gif, synth_gif

    good = synth_gif(6)
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="trailer before any image"):
        parse_gif(good[:13] + good[13 : 13 + 768] + b"\x3b")
    with pytest.raises(ValueError, match="truncated"):
        parse_gif(good[: 13 + 100])  # cut inside the global color table
    # every truncation point must raise ValueError, never escape as a
    # struct/index error (the PNG ADVICE-r7 contract, applied here)
    for cut in range(6, len(good)):
        with pytest.raises(ValueError):
            parse_gif(good[:cut])


def test_gif_decode_distributed_matches_local(spark, sf_dir):
    from pse_stocks_etl_spark.operators.multimodal import (
        attach_gif,
        decode_gif,
        parse_gif,
        synth_gif,
    )
    from pse_stocks_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    rows = {
        r["doc_id"]: r.asDict()
        for r in decode_gif(attach_gif(docs)).collect()
    }
    assert len(rows) == 40
    for doc_id, row in rows.items():
        m = parse_gif(synth_gif(int(doc_id)))
        for k, v in m.items():
            assert row[k] == v, (doc_id, k)


def test_real_decode_dispatches_gif():
    from pse_stocks_etl_spark.operators.multimodal import (
        parse_gif,
        real_decode,
        synth_gif,
    )

    p = synth_gif(11)
    assert real_decode(p) == parse_gif(p)


def test_real_resize_dispatches_gif():
    # r8 verdict item 2: the generic resize entry point must route GIF
    # magics to the real GIF resample and return a decodable GIF.
    from pse_stocks_etl_spark.operators.multimodal import (
        parse_gif,
        real_resize,
        resize_gif_nearest,
        synth_gif,
    )

    for doc_id in (4, 11):  # even=progressive, odd=interlaced
        p = synth_gif(doc_id)
        out = real_resize(p, 6, 4)
        assert out == resize_gif_nearest(p, 6, 4)
        m = parse_gif(out)
        assert (m["width"], m["height"]) == (6, 4)


def test_real_resize_error_names_the_sniffed_format():
    # ADVICE r9: the error must name the format that actually lacks a
    # resample path, not blame MP4/H.264 for every fall-through.
    import pytest

    from pse_stocks_etl_spark.operators.multimodal import real_resize

    with pytest.raises(NotImplementedError, match="video/mp4"):
        real_resize(b"\x00\x00\x00\x18ftypisom", 4, 4)
    with pytest.raises(NotImplementedError, match="image/png"):
        real_resize(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, 4, 4)


def test_gif_garbage_terminator_rejected():
    # ADVICE r8: a byte after the image data that is not a trailer,
    # image separator, or extension introducer must fail loudly.
    import pytest

    from pse_stocks_etl_spark.operators.multimodal import parse_gif, synth_gif

    p = bytearray(synth_gif(6))
    assert p[-1] == 0x3B
    p[-1] = 0x7F
    with pytest.raises(ValueError, match="after image data"):
        parse_gif(bytes(p))
