"""Puffin file format (Iceberg's stats/blob container, spec
https://iceberg.apache.org/puffin-spec/): magic-framed blobs + a JSON
footer describing them. Iceberg FORMAT VERSION 3 stores row-level
DELETION VECTORS as ``deletion-vector-v1`` puffin blobs — the roaring
bitmap serialization v3 standardized is the same RoaringBitmapArray
layout Delta DVs use, so this repo's existing codec
(``delta_dv.serialize_bitmap_array``) reads/writes the vector bytes.

Layout (per spec):
    Magic | Blob1 .. BlobN | Magic | FooterPayload (JSON, utf-8)
          | PayloadSize (int32 LE) | Flags (4 bytes) | Magic
Footer JSON: {"blobs": [{"type", "fields", "snapshot-id",
"sequence-number", "offset", "length", "properties": {...}}, ...],
"properties": {...}}. This writer emits uncompressed footers (flag bit
0 unset); the reader rejects compressed footers loudly (zstd is not in
this container's dependency budget).

Byte-level parity with Apache Iceberg 1.8 puffin output is untested
here (no real v3 tables reachable offline); layout follows the
published spec and is pinned three ways: round-trip tests, a frozen
writer golden, and a reader check against a file HAND-ASSEMBLED from
the spec with no project code (tests/test_iceberg.py puffin goldens).
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"


def write_puffin_file(path: str, blobs: list[dict],
                      file_properties: dict | None = None) -> list[dict]:
    """Write ``blobs`` = [{"type": str, "data": bytes, "properties":
    dict, ...extra footer keys}] and return the footer blob descriptors
    (offset/length filled in)."""
    descs: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        pos = len(MAGIC)
        for b in blobs:
            data = b["data"]
            d = {k: v for k, v in b.items() if k != "data"}
            d.setdefault("fields", [])
            d["offset"] = pos
            d["length"] = len(data)
            descs.append(d)
            f.write(data)
            pos += len(data)
        payload = json.dumps(
            {"blobs": descs,
             "properties": dict(file_properties or {})}).encode("utf-8")
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(b"\x00\x00\x00\x00")
        f.write(MAGIC)
    return descs


def read_puffin_footer(raw: bytes) -> dict:
    """Parse the footer: {"blobs": [...], "properties": {...}}."""
    if raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError("not a puffin file (bad magic)")
    flags = raw[-8:-4]
    if flags[0] & 0x01:
        raise NotImplementedError("compressed puffin footer payloads "
                                  "are not supported")
    (size,) = struct.unpack("<i", raw[-12:-8])
    payload = raw[-12 - size:-12]
    return json.loads(payload.decode("utf-8"))


def read_puffin_blob(raw: bytes, offset: int, length: int) -> bytes:
    return raw[offset:offset + length]
