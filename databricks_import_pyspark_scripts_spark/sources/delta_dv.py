"""Deletion-vector codec for the pure-Python Delta reader: Z85 encoding,
the RoaringBitmapArray "portable" serialization, and the DV file framing —
all per the PUBLIC Delta Lake protocol (github.com/delta-io/delta
PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Format" sections) and
the public RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec).

A deletion vector marks row indexes (0-based physical positions within one
data file) as deleted without rewriting the file — Databricks enables them
BY DEFAULT on new tables (DBR 14+), so a reader without DV support rejects
a large fraction of real tables the reference (running inside Databricks,
unload_databricks_data_to_s3.py:183-193) reads transparently.

Scale split (mirrors Delta's own): DV *bytes* are metadata-sized (compressed
bitmaps, typically KBs per file — a DV that approaches its data file's size
gets compacted away by OPTIMIZE), so they are parsed driver-side alongside
the log; the row-level *filtering* stays executor-side in the scan
(sources/delta_log.py picks an anti-join or a vectorized searchsorted
filter by total cardinality).

Everything here is self-contained stdlib + numpy — no roaring/delta
third-party packages (environment boundary: nothing installable).
"""

from __future__ import annotations

import os
import struct
import uuid
import zlib

import numpy as np

# --------------------------------------------------------------------------
# Z85 (ZeroMQ base-85, rfc.zeromq.org/spec/32): 4-byte big-endian chunks ->
# 5 chars, most significant digit first. Delta uses it for inline DVs and
# for the UUID inside storageType "u" pathOrInlineDv.

_Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 input must be a multiple of 4 bytes, "
                         f"got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 input must be a multiple of 5 chars, "
                         f"got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        out += struct.pack(">I", n)
    return bytes(out)


# --------------------------------------------------------------------------
# RoaringBitmapArray "portable" format: the 64-bit bitmap is an array of
# standard 32-bit roaring bitmaps, the array index being the value's high
# 32 bits. Layout (all little-endian):
#   magic (int32 = 1681511377) | numBitmaps (int64) | bitmap_0 | bitmap_1 ...
# Each 32-bit bitmap uses the RoaringFormatSpec portable serialization.

MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # cardinality above this -> bitset container


def _deserialize_rb32(buf: memoryview, pos: int) -> tuple[np.ndarray, int]:
    """One 32-bit roaring bitmap at ``pos`` -> (sorted uint32 values,
    new position). Handles array, bitset, and run containers."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        n_flag_bytes = (n_containers + 7) // 8
        run_flags = bytes(buf[pos:pos + n_flag_bytes])
        pos += n_flag_bytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    keys = np.empty(n_containers, dtype=np.uint32)
    cards = np.empty(n_containers, dtype=np.int64)
    for i in range(n_containers):
        k, c_minus_1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys[i], cards[i] = k, c_minus_1 + 1
    has_offsets = cookie == _SERIAL_COOKIE_NO_RUN or (
        n_containers >= _NO_OFFSET_THRESHOLD)
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for sequential reads

    def _is_run(i: int) -> bool:
        return bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))

    parts: list[np.ndarray] = []
    for i in range(n_containers):
        base = np.uint32(keys[i]) << np.uint32(16)
        if _is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs,
                                 offset=pos).reshape(-1, 2)
            pos += 4 * n_runs
            vals = np.concatenate([
                np.arange(int(s), int(s) + int(ln) + 1, dtype=np.uint32)
                for s, ln in runs]) if n_runs else np.empty(0, np.uint32)
        elif cards[i] > _ARRAY_MAX:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
        else:
            vals = np.frombuffer(buf, dtype="<u2", count=int(cards[i]),
                                 offset=pos).astype(np.uint32)
            pos += 2 * int(cards[i])
        parts.append(vals + base)
    values = (np.concatenate(parts) if parts
              else np.empty(0, dtype=np.uint32))
    return values, pos


def deserialize_bitmap_array(data: bytes) -> np.ndarray:
    """Portable RoaringBitmapArray bytes -> sorted int64 row indexes."""
    buf = memoryview(data)
    magic, n_bitmaps = struct.unpack_from("<iq", buf, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    parts: list[np.ndarray] = []
    for hi in range(n_bitmaps):
        vals, pos = _deserialize_rb32(buf, pos)
        parts.append(vals.astype(np.int64) + (hi << 32))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(parts))


def serialize_bitmap_array(indexes) -> bytes:
    """Sorted-or-not iterable of row indexes -> portable RoaringBitmapArray
    bytes (array/bitset containers, no-run cookie — a valid encoding any
    spec-conforming reader accepts; run containers are a decode-side-only
    concern here). Used by the TEST fixture writer and the staging writer;
    production never writes Delta."""
    vals = np.unique(np.asarray(list(indexes), dtype=np.int64))
    if vals.size and vals[0] < 0:
        raise ValueError("row indexes must be non-negative")
    n_bitmaps = int(vals[-1] >> 32) + 1 if vals.size else 0
    out = bytearray(struct.pack("<iq", MAGIC, n_bitmaps))
    for hi in range(n_bitmaps):
        lo = vals[(vals >> 32) == hi].astype(np.uint32) & np.uint32(0xFFFFFFFF)
        keys = np.unique(lo >> np.uint32(16))
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
        containers: list[bytes] = []
        for k in keys:
            within = (lo[(lo >> np.uint32(16)) == k]
                      & np.uint32(0xFFFF)).astype(np.uint16)
            out += struct.pack("<HH", int(k), within.size - 1)
            if within.size > _ARRAY_MAX:
                bits = np.zeros(65536, dtype=np.uint8)
                bits[within] = 1
                containers.append(
                    np.packbits(bits, bitorder="little").tobytes())
            else:
                containers.append(within.astype("<u2").tobytes())
        # offsets header (mandatory with the no-run cookie): byte position
        # of each container from the start of THIS bitmap's serialization
        header = 8 + 4 * len(keys)  # cookie+count + descriptive headers
        offset = header + 4 * len(keys)
        for c in containers:
            out += struct.pack("<I", offset)
            offset += len(c)
        for c in containers:
            out += c
    return bytes(out)


# --------------------------------------------------------------------------
# DV file framing ("Deletion Vector File Storage format"): the file opens
# with a format-version byte (1); each vector is stored as
#   <dataSize int32 big-endian> <data> <crc32-of-data int32 big-endian>
# with the descriptor's ``offset`` pointing at the size field and
# ``sizeInBytes`` equal to len(data).

DV_FILE_VERSION = 1


def read_dv_from_file_bytes(blob: bytes, offset: int,
                            size_in_bytes: int) -> bytes:
    if not blob or blob[0] != DV_FILE_VERSION:
        raise ValueError(
            f"unsupported DV file format version {blob[0] if blob else '??'}")
    (stored_size,) = struct.unpack_from(">i", blob, offset)
    if stored_size != size_in_bytes:
        raise ValueError(
            f"DV size mismatch at offset {offset}: descriptor says "
            f"{size_in_bytes}, file says {stored_size}")
    data = bytes(blob[offset + 4: offset + 4 + size_in_bytes])
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size_in_bytes)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError(f"DV checksum mismatch at offset {offset}")
    return data


def write_dv_file(path: str, datas: list[bytes]) -> list[tuple[int, int]]:
    """Write serialized bitmaps into one DV file; returns
    [(offset, sizeInBytes), ...] per input, for descriptor construction.
    TEST/staging utility (production never writes Delta)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    offsets: list[tuple[int, int]] = []
    with open(path, "wb") as f:
        f.write(bytes([DV_FILE_VERSION]))
        pos = 1
        for data in datas:
            offsets.append((pos, len(data)))
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 4 + len(data) + 4
    return offsets


def dv_relative_path(path_or_inline: str) -> str:
    """storageType "u": pathOrInlineDv is ``<optional random prefix><20-char
    z85 uuid>``; the file lives at ``<prefix>/deletion_vector_<uuid>.bin``
    under the table root."""
    encoded_uuid = path_or_inline[-20:]
    prefix = path_or_inline[:-20]
    u = uuid.UUID(bytes=z85_decode(encoded_uuid))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def make_uuid_path_or_inline(u: uuid.UUID, prefix: str = "") -> str:
    """Inverse of ``dv_relative_path`` for the fixture writer."""
    return prefix + z85_encode(u.bytes)


def decode_inline_dv(path_or_inline: str, size_in_bytes: int) -> bytes:
    """storageType "i": the z85 payload may carry up to 3 padding bytes
    (z85 works in 4-byte groups); truncate to the descriptor's size."""
    raw = z85_decode(path_or_inline)
    if len(raw) < size_in_bytes:
        raise ValueError("inline DV shorter than descriptor sizeInBytes")
    return raw[:size_in_bytes]
