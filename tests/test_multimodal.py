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


# ---- audio/video metadata (round 4) ---------------------------------------

def _wav_bytes(channels=2, rate=44100, bits=16, data=b"\x00" * 1000):
    import struct
    byte_rate = rate * channels * bits // 8
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate,
                          channels * bits // 8, bits)
            + b"data" + struct.pack("<I", len(data)) + data)


def _flac_bytes(rate=48000, channels=2, bits=16, total_samples=96000):
    hdr = bytearray(b"fLaC")
    hdr += b"\x80\x00\x00\x22"  # last-metadata STREAMINFO, length 34
    si = bytearray(34)
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) \
        | (((bits - 1) >> 4) & 1)
    si[13] = (((bits - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    si[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return bytes(hdr + si)


def _mp4_bytes(timescale=600, duration=1800):
    import struct
    mvhd = (b"\x00" + b"\x00\x00\x00"      # version 0 + flags
            + struct.pack(">II", 0, 0)      # ctime, mtime
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80)
    mvhd = struct.pack(">I", len(mvhd) + 8) + b"mvhd" + mvhd
    moov = struct.pack(">I", len(mvhd) + 8) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_parse_wav_header():
    from dataprofiler_spark.operators.multimodal import parse_av_header

    out = parse_av_header(_wav_bytes(channels=1, rate=8000, bits=8,
                                     data=b"x" * 16000))
    assert out["format"] == "wav"
    assert out["channels"] == 1 and out["sample_rate"] == 8000
    assert out["bits_per_sample"] == 8
    assert out["duration_ms"] == 2000  # 16000 bytes / 8000 B/s


def test_parse_flac_header():
    from dataprofiler_spark.operators.multimodal import parse_av_header

    out = parse_av_header(_flac_bytes(rate=48000, channels=2, bits=24,
                                      total_samples=96000))
    assert out["format"] == "flac"
    assert out["sample_rate"] == 48000 and out["channels"] == 2
    assert out["bits_per_sample"] == 24
    assert out["duration_ms"] == 2000


def test_parse_mp4_header():
    from dataprofiler_spark.operators.multimodal import parse_av_header

    out = parse_av_header(_mp4_bytes(timescale=600, duration=1800))
    assert out["format"] == "mp4"
    assert out["duration_ms"] == 3000


def test_parse_av_corrupt_unknown():
    from dataprofiler_spark.operators.multimodal import parse_av_header

    assert parse_av_header(b"")["format"] == "unknown"
    assert parse_av_header(b"RIFFxxxx")["format"] == "unknown"
    assert parse_av_header(b"RIFF\x00\x00\x00\x00WAVE")["format"] == "wav"


def test_wav_adapter_roundtrip(spark):
    """The expression-synthesized WAV container must parse back to the
    exact parameters it was derived from."""
    from dataprofiler_spark.operators.multimodal import (
        decode_av_features, documents_as_wav_media)

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "abc"), (3, None)],
        ["doc_id", "text"])
    feats = decode_av_features(documents_as_wav_media(df), "id", "payload")
    rows = {r["id"]: r for r in feats.collect()}
    assert rows[1]["format"] == "wav"
    assert rows[1]["channels"] == 2            # id 1 -> 1 % 2 + 1
    assert rows[1]["sample_rate"] == 8000 + (len("hello world") % 8) * 1000
    assert rows[1]["bits_per_sample"] == 16
    assert rows[3]["byte_len"] == 44           # NULL text -> empty data
    assert rows[2]["duration_ms"] == (3 * 1000) // (
        rows[2]["sample_rate"] * rows[2]["channels"] * 2)


def test_av_profile_matches_oracle(spark, duck, sf_dir):
    from dataprofiler_spark.queries import ORACLE_SQL, SPARK_QUERIES
    from tests.oracle_utils import assert_frames_match

    name = "av_profile_documents"
    sdf = SPARK_QUERIES[name](spark, sf_dir).toPandas()
    ddf = duck.sql(ORACLE_SQL[name]).df()
    assert_frames_match(sdf, ddf, name)
