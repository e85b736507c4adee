"""Pure-stdlib ISO-BMFF (MP4) CONTAINER parser for frame-sample
planning — no media libraries (VERDICT r13 #5: real video corpora are
MP4; container-level sampling + metadata is achievable stdlib-only even
where H.264 decode is not).

Derived entirely from the public ISO/IEC 14496-12 base media file
format: a box tree (``size | type | payload``, 64-bit ``largesize``
when size==1, to-EOF when size==0) with ``moov/mvhd`` movie metadata
and per-track ``trak/mdia`` metadata whose ``stbl`` sample tables —
``stts`` (time-to-sample), ``stsc`` (sample-to-chunk), ``stsz``
(sample sizes), ``stco``/``co64`` (chunk offsets), ``stsd`` (codec
sample description) — fully determine every sample's
``(byte offset, byte size, timestamp)`` without touching codec
bitstreams. Supported surface, everything else LOUD:

* ``parse_mp4`` returns container metadata (movie timescale/duration)
  and per-track ``handler``/``codec``/``width``/``height``/``fps`` plus
  the full expanded sample table — works for ANY codec (avc1, hvc1,
  mp4v, jpeg, mp4a, ...): planning never needs a decoder.
* ``parse_mp4_mjpeg`` bridges to ``operators.multimodal.
  frame_sample_features`` (the AVI parser's shape): only the
  QuickTime/MJPEG ``jpeg`` sample-entry fourcc DECODES (each sample is
  one complete baseline/progressive JPEG for ``operators.jpeg_codec``);
  any other video codec rejects naming the fourcc — H.264/H.265/MPEG-4
  bitstream decode is out of stdlib scope by design.
* fragmented MP4 (``moof``/``mvex``) rejects loudly — sample tables
  live in fragments there, a different planning path.

Scale shape: parsing is driver-free byte slicing inside the executor
task that holds the payload (Arrow-batched ``mapInPandas`` via
``frame_sample_features``); the sample PLAN is metadata-only, and
sampled-frame decode cost scales with sampled frames, not video
length. The fixture encoder hand-assembles golden-byte files (the
puffin-codec test model), multi-chunk so ``stsc`` expansion is
actually exercised.
"""

from __future__ import annotations

import struct


class Mp4FormatError(ValueError):
    """Malformed or out-of-scope MP4 payload."""


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end): 32-bit sizes, 64-bit largesize, size==0 = to-end."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        off = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4FormatError(f"truncated largesize {btype!r}")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            off = pos + 16
        elif size == 0:
            size = end - pos
        if size < off - pos or pos + size > end:
            raise Mp4FormatError(f"box {btype!r} overruns its parent")
        yield btype, off, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, o, e in _boxes(data, start, end):
        if t == btype:
            return o, e
    return None


def _full_box(data: bytes, off: int) -> tuple[int, int, int]:
    """(version, flags, payload offset after the version/flags word)."""
    version = data[off]
    flags = int.from_bytes(data[off + 1:off + 4], "big")
    return version, flags, off + 4


def _parse_stbl(data: bytes, start: int, end: int) -> dict:
    """Expand the sample tables of one ``stbl`` box into
    {"codec", "width", "height", "samples": [(offset, size, t_units)]}.
    ``t_units`` is the sample's decode time in MEDIA TIMESCALE units
    (the caller scales to ms)."""
    out: dict = {}
    stts = stsc = stsz = stco = None
    co64 = False
    for t, o, e in _boxes(data, start, end):
        if t == b"stsd":
            _, _, p = _full_box(data, o)
            (n,) = struct.unpack(">I", data[p:p + 4])
            if n < 1:
                raise Mp4FormatError("empty stsd")
            ep = p + 4
            (esz,) = struct.unpack(">I", data[ep:ep + 4])
            out["codec"] = data[ep + 4:ep + 8].decode("latin-1")
            # visual sample entry: width/height at fixed offsets past
            # the 8-byte entry header + 6 reserved + 2 dref index +
            # 16 predefined/reserved bytes (14496-12 12.1.3)
            if esz >= 36 + 16:
                out["width"], out["height"] = struct.unpack(
                    ">HH", data[ep + 32:ep + 36])
        elif t == b"stts":
            _, _, p = _full_box(data, o)
            (n,) = struct.unpack(">I", data[p:p + 4])
            stts = [struct.unpack(">II", data[p + 4 + 8 * i:
                                              p + 12 + 8 * i])
                    for i in range(n)]
        elif t == b"stsc":
            _, _, p = _full_box(data, o)
            (n,) = struct.unpack(">I", data[p:p + 4])
            stsc = [struct.unpack(">III", data[p + 4 + 12 * i:
                                               p + 16 + 12 * i])
                    for i in range(n)]
        elif t == b"stsz":
            _, _, p = _full_box(data, o)
            uniform, n = struct.unpack(">II", data[p:p + 8])
            stsz = (uniform, n,
                    None if uniform else list(struct.unpack(
                        f">{n}I", data[p + 8:p + 8 + 4 * n])))
        elif t in (b"stco", b"co64"):
            _, _, p = _full_box(data, o)
            (n,) = struct.unpack(">I", data[p:p + 4])
            fmt, w = (">Q", 8) if t == b"co64" else (">I", 4)
            co64 = t == b"co64"
            stco = [struct.unpack(fmt, data[p + 4 + w * i:
                                            p + 4 + w * (i + 1)])[0]
                    for i in range(n)]
    for name, v in (("stts", stts), ("stsc", stsc), ("stsz", stsz),
                    ("stco", stco)):
        if v is None:
            raise Mp4FormatError(f"stbl missing {name}"
                                 + (" / co64" if name == "stco" else ""))
    uniform, n_samples, sizes = stsz
    # expand stsc: samples-per-chunk for each chunk 1..len(stco)
    spc_of = []
    for i, (first, spc, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(stco)
        spc_of.extend([spc] * (last - first + 1))
    if len(spc_of) != len(stco):
        raise Mp4FormatError("stsc chunk runs disagree with stco")
    # per-sample decode times from stts
    times = []
    t_units = 0
    for count, delta in stts:
        for _ in range(count):
            times.append(t_units)
            t_units += delta
    if len(times) != n_samples:
        raise Mp4FormatError(
            f"stts covers {len(times)} samples, stsz declares "
            f"{n_samples}")
    samples = []
    si = 0
    for ci, chunk_off in enumerate(stco):
        run = chunk_off
        for _ in range(spc_of[ci]):
            if si >= n_samples:
                break
            size = uniform or sizes[si]
            samples.append((run, size, times[si]))
            run += size
            si += 1
    if si != n_samples:
        raise Mp4FormatError(
            f"chunk map places {si} samples, stsz declares {n_samples}")
    out["samples"] = samples
    out["co64"] = co64
    return out


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes -> {"timescale", "duration_ms", "tracks": [...]} —
    container metadata + fully expanded per-track sample plans, for
    ANY codec. Each track dict: handler ('vide'/'soun'/...), codec
    fourcc, media timescale, duration_ms, fps (samples per second from
    the media duration; 0 when duration is 0), n_samples, width/height
    (visual tracks), and samples = [(byte offset, byte size, ts_ms)]."""
    if _find(data, 0, len(data), b"ftyp") is None:
        raise Mp4FormatError("missing ftyp box (not an ISO-BMFF file)")
    if _find(data, 0, len(data), b"moof") is not None:
        raise Mp4FormatError(
            "fragmented MP4 (moof) not supported: sample tables live "
            "in fragments")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4FormatError("missing moov box")
    ms, me = moov
    if _find(data, ms, me, b"mvex") is not None:
        raise Mp4FormatError(
            "fragmented MP4 (mvex) not supported: sample tables live "
            "in fragments")
    mvhd = _find(data, ms, me, b"mvhd")
    if mvhd is None:
        raise Mp4FormatError("missing mvhd box")
    v, _, p = _full_box(data, mvhd[0])
    if v == 1:
        timescale, duration = struct.unpack(">IQ", data[p + 16:p + 28])
    else:
        timescale, duration = struct.unpack(">II", data[p + 8:p + 16])
    out = {"timescale": int(timescale),
           "duration_ms": int(duration) * 1000 // int(timescale)
           if timescale else 0,
           "tracks": []}
    for t, o, e in _boxes(data, ms, me):
        if t != b"trak":
            continue
        mdia = _find(data, o, e, b"mdia")
        if mdia is None:
            raise Mp4FormatError("trak without mdia")
        do, de = mdia
        mdhd = _find(data, do, de, b"mdhd")
        hdlr = _find(data, do, de, b"hdlr")
        minf = _find(data, do, de, b"minf")
        if mdhd is None or hdlr is None or minf is None:
            raise Mp4FormatError("mdia missing mdhd/hdlr/minf")
        v, _, p = _full_box(data, mdhd[0])
        if v == 1:
            mts, mdur = struct.unpack(">IQ", data[p + 16:p + 28])
        else:
            mts, mdur = struct.unpack(">II", data[p + 8:p + 16])
        _, _, hp = _full_box(data, hdlr[0])
        handler = data[hp + 4:hp + 8].decode("latin-1")
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise Mp4FormatError("minf without stbl")
        tbl = _parse_stbl(data, stbl[0], stbl[1])
        n = len(tbl["samples"])
        track = {
            "handler": handler,
            "codec": tbl.get("codec", ""),
            "timescale": int(mts),
            "duration_ms": int(mdur) * 1000 // int(mts) if mts else 0,
            "fps": (n * mts / mdur) if mdur else 0.0,
            "n_samples": n,
            "width": tbl.get("width"),
            "height": tbl.get("height"),
            "samples": [(off, sz, t_units * 1000 // int(mts)
                         if mts else 0)
                        for off, sz, t_units in tbl["samples"]],
        }
        out["tracks"].append(track)
    if not out["tracks"]:
        raise Mp4FormatError("moov carries no trak")
    return out


class _SampleSlices:
    """Lazy by-index access to sample payloads: slicing happens only
    for frames the sampler actually touches."""

    def __init__(self, data: bytes, samples: list[tuple]):
        self._data = data
        self._samples = samples

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(self, i: int) -> bytes:
        off, size, _ts = self._samples[i]
        if off + size > len(self._data):
            raise Mp4FormatError(
                f"sample {i} ({off}+{size}) overruns the file")
        return self._data[off:off + size]


#: QuickTime/MJPEG sample-entry fourccs whose samples are complete
#: JPEG images the stdlib codec decodes; everything else is a real
#: video codec needing a library decoder.
_JPEG_CODECS = ("jpeg", "mjpa")


def parse_mp4_mjpeg(data: bytes) -> dict:
    """MP4 bytes -> the ``parse_avi_mjpeg`` dict shape for
    ``frame_sample_features``: {"usec_per_frame", "width", "height",
    "n_frames", "frames"} with frames as LAZY byte slices — only
    sampled frames are materialized. Requires ONE video track with the
    QuickTime 'jpeg' sample entry and a uniform frame cadence (single
    stts run); H.264/H.265/MPEG-4 tracks reject naming the codec
    (their metadata + frame plan stay available via ``parse_mp4``)."""
    meta = parse_mp4(data)
    vids = [t for t in meta["tracks"] if t["handler"] == "vide"]
    if not vids:
        raise Mp4FormatError("no video track (hdlr 'vide')")
    if len(vids) > 1:
        raise Mp4FormatError(f"{len(vids)} video tracks (expected 1)")
    tr = vids[0]
    if tr["codec"] not in _JPEG_CODECS:
        raise Mp4FormatError(
            f"video codec {tr['codec']!r} not supported: only "
            f"{'/'.join(_JPEG_CODECS)} samples decode with the stdlib "
            f"JPEG codec; use parse_mp4 for the metadata/frame plan or "
            f"inject a decoder for other codecs")
    n = tr["n_samples"]
    if n == 0:
        raise Mp4FormatError("video track has no samples")
    if n > 1:
        deltas = {tr["samples"][i + 1][2] - tr["samples"][i][2]
                  for i in range(n - 1)}
        if len(deltas) > 1:
            raise Mp4FormatError(
                f"variable frame cadence {sorted(deltas)} ms: the "
                f"uniform-rate sampler bridge needs a single stts "
                f"run; plan via parse_mp4 instead")
        usec = next(iter(deltas)) * 1000
    else:
        usec = tr["duration_ms"] * 1000
    return {"usec_per_frame": int(usec),
            "width": int(tr["width"] or 0),
            "height": int(tr["height"] or 0),
            "n_frames": n,
            "frames": _SampleSlices(data, [
                (off, sz, ts) for off, sz, ts in tr["samples"]])}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, flags: int,
          payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big")
                + payload)


def encode_mp4_jpeg(jpeg_frames: list[bytes], fps: int = 10,
                    width: int = 32, height: int = 32,
                    samples_per_chunk: int = 2,
                    codec: bytes = b"jpeg") -> bytes:
    """JPEG frame list -> minimal ISO-BMFF bytes: ``ftyp`` + ``mdat``
    (frames concatenated, split into ``samples_per_chunk``-sized
    chunks so stsc expansion is really exercised) + ``moov`` with the
    full stbl sample tables — the deterministic golden-bytes fixture
    encoder (``codec`` overridable to fabricate avc1-track fixtures
    for rejection tests)."""
    if not jpeg_frames:
        raise ValueError("at least one frame required")
    if 1000 % fps:
        raise ValueError("fps must divide 1000 (ms timescale)")
    n = len(jpeg_frames)
    delta = 1000 // fps                   # media timescale = 1000
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isomiso2")
    mdat_payload = b"".join(jpeg_frames)
    mdat_start = len(ftyp) + 8            # first sample's file offset

    # chunk layout: fixed samples_per_chunk (ragged tail), offsets
    # into the concatenated mdat payload
    chunk_offs: list[int] = []
    stsc_entries: list[tuple[int, int, int]] = []
    run = mdat_start
    i = 0
    ci = 0
    while i < n:
        take = min(samples_per_chunk, n - i)
        chunk_offs.append(run)
        if not stsc_entries or stsc_entries[-1][1] != take:
            stsc_entries.append((ci + 1, take, 1))
        run += sum(len(f) for f in jpeg_frames[i:i + take])
        i += take
        ci += 1

    stsd_entry = (struct.pack(">I", 86) + codec
                  + b"\x00" * 6 + struct.pack(">H", 1)
                  + b"\x00" * 16
                  + struct.pack(">HH", width, height)
                  + struct.pack(">II", 0x480000, 0x480000)
                  + struct.pack(">I", 0) + struct.pack(">H", 1)
                  + b"\x00" * 32
                  + struct.pack(">Hh", 24, -1))
    stbl = (_full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
            + _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
            + _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                    + b"".join(struct.pack(">III", *e)
                               for e in stsc_entries))
            + _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(f))
                               for f in jpeg_frames))
            + _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offs))
                    + b"".join(struct.pack(">I", o)
                               for o in chunk_offs)))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    minf = _box(b"minf",
                _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                + dinf + _box(b"stbl", stbl))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, 1000, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, duration)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
