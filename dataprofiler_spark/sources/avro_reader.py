"""Pure-Python Avro Object Container File reader, distributed over files.

The spark-avro connector jar is not bundled with this Spark distribution
and the environment has no network access to fetch it (and no fastavro),
so AVRO support is implemented directly against the public Apache Avro
1.x specification (reference read surface: avro_data.py:14-160):

* container header: magic ``Obj\\x01`` + file metadata map
  (``avro.schema`` JSON, ``avro.codec``) + 16-byte sync marker
* blocks: record count + byte length + binary-encoded records + sync;
  ``null`` and ``deflate`` (raw zlib) codecs
* binary encoding: zig-zag varint longs, IEEE little-endian float/double,
  length-prefixed bytes/strings, records/arrays/maps/unions/enums/fixed

Scale path: one Avro FILE is decoded by one task (the container format
is block-splittable in principle, but locating sync markers without the
connector costs a full scan anyway), and a DIRECTORY of Avro files
parallelizes per-file via ``sc.binaryFiles`` → flatMap(decode). That is
the honest Python-side throughput story; columnar formats (parquet/orc)
remain the recommended scan path at 100 TB.

Nested records flatten downstream via ``flatten_struct_columns`` exactly
like JSON (the reference flattens Avro the same way,
avro_data.py:100-160).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    """Zig-zag varint (Avro spec 'Binary Encoding')."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


# ---------------------------------------------------------------------------
# schema-driven decoding
# ---------------------------------------------------------------------------

def _decode(schema, buf: io.BytesIO, names: dict):
    if isinstance(schema, str):
        if schema in names:
            return _decode(names[schema], buf, names)
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unknown avro type {t!r}")
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf, names)
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            names[schema["name"]] = schema
        return {f["name"]: _decode(f["type"], buf, names)
                for f in schema["fields"]}
    if t == "enum":
        if schema.get("name"):
            names[schema["name"]] = schema
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        if schema.get("name"):
            names[schema["name"]] = schema
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
        return out
    return _decode(t, buf, names)  # {"type": "string"} wrapper form


def _snappy_decompress(block: bytes) -> bytes:
    """Avro snappy block = raw-snappy payload + 4-byte big-endian CRC32
    of the UNCOMPRESSED data (avro spec §container-file codecs). Raw
    snappy carries the uncompressed length as its preamble varint, so
    pyarrow's size-requiring decompressor needs no external hint."""
    payload, crc = block[:-4], block[-4:]
    n, shift, i = 0, 0, 0
    while True:
        b = payload[i]
        n |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not (b & 0x80):
            break
    import pyarrow as pa
    out = pa.decompress(payload, decompressed_size=n, codec="snappy",
                        asbytes=True)
    if zlib.crc32(out) & 0xFFFFFFFF != int.from_bytes(crc, "big"):
        raise ValueError("avro snappy block CRC mismatch")
    return out


def decode_container(data: bytes) -> tuple[dict, list[dict]]:
    """(schema, rows) from Avro Object Container File bytes."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    rows: list[dict] = []
    names: dict = {}
    while True:
        try:
            count = _read_long(buf)
        except EOFError:
            break
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            block = _snappy_decompress(block)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            row = _decode(schema, bbuf, names)
            rows.append(row if isinstance(row, dict) else {"value": row})
        if buf.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, rows


def read_avro(spark, path: str):
    """Avro file or directory of files → DataFrame.

    Directory: per-file decode fans out over executors (binaryFiles).
    Single file: one-task decode. Schema inferred by Spark from the
    decoded python rows (Avro unions of [null, X] become nullable X).
    """
    import os

    if os.path.isdir(path):
        rdd = spark.sparkContext.binaryFiles(path + "/*.avro") \
            .flatMap(lambda kv: decode_container(kv[1])[1])
        return spark.createDataFrame(rdd)
    with open(path, "rb") as f:
        _schema, rows = decode_container(f.read())
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------------------
# test-fixture writer (minimal, null codec) — lets round-trip tests run
# without fastavro; NOT a production write path
# ---------------------------------------------------------------------------

def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([byte | 0x80]))
        else:
            out.write(bytes([byte]))
            break


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            _write_long(out, int(value))
        elif t == "float":
            out.write(struct.pack("<f", value))
        elif t == "double":
            out.write(struct.pack("<d", value))
        elif t == "bytes":
            _write_bytes(out, value)
        elif t == "string":
            _write_bytes(out, value.encode("utf-8"))
        else:
            raise ValueError(t)
        return
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (value is None) == (bt == "null"):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise ValueError("no union branch for value")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value[f["name"]], out)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out)
        _write_long(out, 0)
    else:
        _encode(t, value, out)


def write_avro_fixture(path: str, schema: dict, rows: list[dict]) -> None:
    """Write a minimal null-codec Avro container (tests only)."""
    sync = b"0123456789abcdef"
    out = io.BytesIO()
    out.write(MAGIC)
    _write_long(out, 2)
    _write_bytes(out, b"avro.schema")
    _write_bytes(out, json.dumps(schema).encode("utf-8"))
    _write_bytes(out, b"avro.codec")
    _write_bytes(out, b"null")
    _write_long(out, 0)
    out.write(sync)
    block = io.BytesIO()
    for row in rows:
        _encode(schema, row, block)
    _write_long(out, len(rows))
    _write_bytes(out, block.getvalue())
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
