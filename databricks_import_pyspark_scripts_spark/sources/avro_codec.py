"""Pure-Python Apache Avro object-container-file codec — the subset the
Apache Iceberg metadata layer uses (manifest lists and manifests are Avro
files; the container's WRITER SCHEMA is embedded in its header, so a
generic decoder needs no external schema registry).

Implements the public Avro 1.11 specification
(avro.apache.org/docs/current/specification): zigzag-varint ints/longs,
little-endian IEEE float/double, length-prefixed bytes/strings, arrays and
maps in blocks (negative block counts carry a byte size to skip), unions
as a branch index + value, records as field concatenation, fixed, and the
object container framing (magic ``Obj\\x01``, metadata map with
``avro.schema`` / ``avro.codec``, 16-byte sync marker, data blocks of
``count, byte-length, payload, sync``). Codecs: ``null`` and ``deflate``
(raw zlib, the spec's two required codecs).

Logical types (timestamps et al.) pass through as their underlying
primitive — exactly what the Iceberg reader wants (it interprets fields by
the spec's field names/ids, not by Avro logical annotations).

Scope note: this is METADATA-layer tooling (KB-to-MB files, driver-side),
the same class as the Delta log reader — data files stay parquet and are
scanned by executors. No part of this touches the row-data path.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive codecs

def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int AND long share the wire format)."""
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


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# generic datum decode/encode against a (parsed JSON) schema

def _resolve(schema, names: dict):
    """Named-type references: a bare string that is not a primitive refers
    to a previously defined record/fixed/enum."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def read_datum(buf: io.BytesIO, schema, names: dict | None = None):
    names = names if names is not None else {}
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return read_datum(buf, schema[idx], names)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if t in ("record", "error"):
            _register(schema, names)
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]] = read_datum(buf, f["type"], names)
            return rec
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)  # block byte size: present, unused
                    n = -n
                for _ in range(n):
                    out.append(read_datum(buf, schema["items"], names))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = read_datum(buf, schema["values"], names)
            return out
        if t == "fixed":
            _register(schema, names)
            return buf.read(schema["size"])
        if t == "enum":
            _register(schema, names)
            return schema["symbols"][_read_long(buf)]
        # {"type": "string", "logicalType": ...} and friends fall through
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
    if isinstance(t, (dict, list)):
        return read_datum(buf, t, names)
    raise ValueError(f"unsupported Avro type {t!r}")


def _register(schema: dict, names: dict) -> None:
    nm = schema.get("name")
    if nm:
        names[nm] = schema
        ns = schema.get("namespace")
        if ns:
            names[f"{ns}.{nm}"] = schema


def write_datum(out: bytearray, datum, schema, names: dict | None = None) -> None:
    names = names if names is not None else {}
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: pick the branch by datum shape
        for i, branch in enumerate(schema):
            if _matches(datum, _resolve(branch, names)):
                _write_long(out, i)
                write_datum(out, datum, branch, names)
                return
        raise ValueError(f"datum {datum!r} matches no union branch {schema}")
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if t in ("record", "error"):
            _register(schema, names)
            for f in schema["fields"]:
                write_datum(out, datum.get(f["name"]), f["type"], names)
            return
        if t == "array":
            if datum:
                _write_long(out, len(datum))
                for item in datum:
                    write_datum(out, item, schema["items"], names)
            _write_long(out, 0)
            return
        if t == "map":
            if datum:
                _write_long(out, len(datum))
                for k, v in datum.items():
                    _write_bytes(out, k.encode("utf-8"))
                    write_datum(out, v, schema["values"], names)
            _write_long(out, 0)
            return
        if t == "fixed":
            _register(schema, names)
            out.extend(datum)
            return
        if t == "enum":
            _register(schema, names)
            _write_long(out, schema["symbols"].index(datum))
            return
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if datum else 0)
        return
    if t in ("int", "long"):
        _write_long(out, int(datum))
        return
    if t == "float":
        out.extend(struct.pack("<f", datum))
        return
    if t == "double":
        out.extend(struct.pack("<d", datum))
        return
    if t == "bytes":
        _write_bytes(out, bytes(datum))
        return
    if t == "string":
        _write_bytes(out, datum.encode("utf-8"))
        return
    if isinstance(t, (dict, list)):
        write_datum(out, datum, t, names)
        return
    raise ValueError(f"unsupported Avro type {t!r}")


def _matches(datum, schema) -> bool:
    t = schema if isinstance(schema, str) else schema.get("type")
    if t == "null":
        return datum is None
    if datum is None:
        return False
    if t == "boolean":
        return isinstance(datum, bool)
    if t in ("int", "long"):
        return isinstance(datum, int) and not isinstance(datum, bool)
    if t in ("float", "double"):
        return isinstance(datum, float) or (
            isinstance(datum, int) and not isinstance(datum, bool))
    if t == "bytes" or t == "fixed":
        return isinstance(datum, (bytes, bytearray))
    if t == "string":
        return isinstance(datum, str)
    if t in ("record", "error", "map"):
        return isinstance(datum, dict)
    if t == "array":
        return isinstance(datum, list)
    if t == "enum":
        return isinstance(datum, str)
    return True


# ---------------------------------------------------------------------------
# object container files

def read_container(data: bytes) -> tuple[dict, list]:
    """(metadata, records) from an Avro object container file. The writer
    schema comes from the header's ``avro.schema``; ``null`` and
    ``deflate`` codecs supported."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = read_datum(buf, meta_schema)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if len(block) != size:
            raise EOFError("truncated Avro data block")
        if codec == "deflate":
            block = zlib.decompress(block, -zlib.MAX_WBITS)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        names: dict = {}
        for _ in range(count):
            records.append(read_datum(bbuf, schema, names))
        if buf.read(16) != sync:
            raise ValueError("Avro sync marker mismatch (corrupt block)")
    return {k: v for k, v in meta.items()}, records


def write_container(schema: dict, records: list,
                    codec: str = "deflate",
                    metadata: dict[str, bytes] | None = None) -> bytes:
    """Serialize ``records`` (python dicts/values) under ``schema`` as one
    Avro object container file (single block)."""
    body = bytearray()
    names: dict = {}
    for r in records:
        write_datum(body, r, schema, names)
    payload = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-zlib.MAX_WBITS)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported Avro codec {codec!r}")
    out = bytearray()
    out.extend(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
            **(metadata or {})}
    write_datum(out, meta, {"type": "map", "values": "bytes"})
    sync = b"\x00" * 8 + b"spark-gr"  # fixed marker: deterministic output
    out.extend(sync)
    _write_long(out, len(records))
    _write_bytes(out, payload)
    out.extend(sync)
    return bytes(out)
