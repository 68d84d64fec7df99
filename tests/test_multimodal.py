"""Multimodal binary-column plumbing: REAL container-header parsing
(PNG/GIF/BMP/JPEG dimensions from header bytes — no codec library),
Arrow-batched mapInPandas contract, and the synthesized-PNG adapter the
oracle query drives end-to-end."""

from __future__ import annotations

import struct

from dataprofiler_spark.operators.multimodal import (PNG_SIG,
                                                     decode_media_features,
                                                     documents_as_png_media,
                                                     parse_media_header)


def _png(w, h):
    return (PNG_SIG + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00" + b"\0" * 4)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\0" * 6


def _bmp(w, h):
    return (b"BM" + b"\0" * 16 + struct.pack("<ii", w, h) + b"\0" * 8)


def _jpeg(w, h):
    # SOI, APP0 (JFIF stub), SOF0 with height/width, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\0" + b"\0" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_media_header_formats():
    assert parse_media_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_media_header(_gif(320, 200)) == ("gif", 320, 200)
    assert parse_media_header(_bmp(1024, 768)) == ("bmp", 1024, 768)
    assert parse_media_header(_jpeg(800, 600)) == ("jpeg", 800, 600)
    assert parse_media_header(b"plain text") == ("unknown", None, None)
    assert parse_media_header(b"") == ("unknown", None, None)
    # truncated PNG: signature only → unknown, no crash
    assert parse_media_header(PNG_SIG)[0] == "unknown"


def test_decode_media_features_mixed_formats(spark):
    rows = [(1, _png(10, 20)), (2, _gif(30, 40)), (3, _jpeg(50, 60)),
            (4, b"not an image")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in
           decode_media_features(df, "id", "payload").collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 10, 20)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("gif", 30, 40)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("jpeg", 50, 60)
    assert got[4]["format"] == "unknown" and got[4]["width"] is None
    assert got[4]["byte_len"] == len(b"not an image")


def test_png_adapter_roundtrips_through_real_parser(spark):
    docs = spark.createDataFrame(
        [(7, "hello world"), (300, "x" * 600)], ["doc_id", "text"])
    media = documents_as_png_media(docs)
    got = {r["id"]: r for r in
           decode_media_features(media, "id", "payload").collect()}
    # width = len(text) % 512 + 16, height = doc_id % 512 + 16
    assert (got[7]["format"], got[7]["width"], got[7]["height"]) == \
        ("png", 11 % 512 + 16, 7 + 16)
    assert (got[300]["width"], got[300]["height"]) == (600 % 512 + 16, 300 + 16)
    assert got[7]["byte_len"] == 33 + 11


def test_parse_bmp_topdown_negative_height():
    """Top-down DIBs store a NEGATIVE signed height; the parser must
    report abs(height), not a ~4.29e9 unsigned misread."""
    hdr = (b"BM" + b"\0" * 16
           + struct.pack("<i", 640) + struct.pack("<i", -480))
    assert parse_media_header(hdr) == ("bmp", 640, 480)


def test_parse_jpeg_fill_bytes_and_standalone_markers():
    """0xFF fill padding between segments and standalone markers (TEM,
    RST0-7) carry no length field — the walker must skip them instead of
    misreading payload bytes as a segment length."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\0" + b"\0" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 600, 800) + b"\x03")
    # SOI, fill bytes, APP0, TEM, RST3, more fill, SOF0, EOI
    data = (b"\xff\xd8" + b"\xff\xff\xff" + app0 + b"\xff\x01"
            + b"\xff\xd3" + b"\xff\xff" + sof0 + b"\xff\xd9")
    assert parse_media_header(data) == ("jpeg", 800, 600)
