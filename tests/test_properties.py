"""Property-based tests (hypothesis): invariants that must hold for ANY
input, driver-side logic only (fast, no Spark jobs per example)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from databricks_import_pyspark_scripts_spark.operators.partitioning import (
    get_partition_count,
)
from databricks_import_pyspark_scripts_spark.sources.versioned import (
    parse_table_versions_map,
)

table_names = st.from_regex(r"[a-z][a-z0-9_]{0,10}(\.[a-z][a-z0-9_]{0,10}){0,2}",
                            fullmatch=True)


@given(st.dictionaries(table_names, st.tuples(
    st.integers(0, 10**9), st.integers(0, 10**9)), min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)
def test_versions_map_roundtrip(d):
    s = ",".join(f"{t}={a}-{b}" for t, (a, b) in d.items())
    assert parse_table_versions_map(s) == {t: [a, b] for t, (a, b) in d.items()}


@given(st.integers(0, 10**12), st.integers(1, 10**9))
@settings(max_examples=500, deadline=None)
def test_partition_count_invariants(n, m):
    p = get_partition_count(n, m)
    assert p >= 1                        # never zero partitions
    assert p == max(1, math.ceil(n / m))
    assert (p - 1) * m < max(n, 1)       # no overshoot: p-1 files can't hold n
    assert p * m >= n                    # p files always suffice


@given(st.integers(0, 9999),            # md5 bucket
       st.integers(1, 10 ** 13),        # per-source token total
       st.integers(1, 10 ** 13),        # corpus token budget
       st.integers(1, 100))             # integer weight percent
@settings(max_examples=300, deadline=None)
def test_mixture_predicate_equals_rational_rate(bucket, src_tok, budget, w):
    """The cross-multiplied int64 keep predicate must agree EXACTLY with
    the rational keep rate bucket/10000 < budget*w/(100*src_tok) — and
    never overflow int64 — for petabyte-scale token counts."""
    from fractions import Fraction

    lhs = bucket * src_tok
    rhs = budget * w * 100  # buckets // 100 with MIX_BUCKETS = 10000
    assert lhs < 2 ** 63 and rhs < 2 ** 63
    exact = Fraction(bucket, 10000) < Fraction(budget * w, 100 * src_tok)
    assert (lhs < rhs) == exact


@given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)),
                min_size=0, max_size=20))
@settings(max_examples=12, deadline=None)
def test_pagerank_exact_mass_bounds_random_graphs(edge_list):
    """On ANY graph: every vertex's fixed-point PR stays within
    [teleport base, n*scale], and the total never exceeds the initial
    mass plus teleport top-up (floors only ever REMOVE mass)."""
    from databricks_import_pyspark_scripts_spark.operators.graph import (
        PR_SCALE,
        pagerank_exact,
    )
    from databricks_import_pyspark_scripts_spark.session import get_spark

    spark = get_spark("spark_graft_tests", master="local[4]")
    n = 12
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    prs = [r.pr for r in pagerank_exact(v, e, iters=2).collect()]
    base = (15 * PR_SCALE) // 100
    assert len(prs) == n
    assert all(base <= p <= n * PR_SCALE for p in prs)
    assert sum(prs) <= n * PR_SCALE + n  # floors only remove mass


# --- deletion-vector codec (sources/delta_dv.py) -----------------------------

from databricks_import_pyspark_scripts_spark.sources.delta_dv import (  # noqa: E402
    deserialize_bitmap_array,
    read_dv_from_file_bytes,
    serialize_bitmap_array,
    write_dv_file,
    z85_decode,
    z85_encode,
)


@given(st.binary(min_size=0, max_size=64).filter(lambda b: len(b) % 4 == 0))
@settings(max_examples=200, deadline=None)
def test_z85_roundtrip(data):
    assert z85_decode(z85_encode(data)) == data


@given(st.lists(
    st.one_of(st.integers(0, 1 << 20),          # dense low range
              st.integers(0, (1 << 34) - 1)),   # cross the 32-bit key split
    min_size=0, max_size=500))
@settings(max_examples=150, deadline=None)
def test_roaring_bitmap_array_roundtrip(indexes):
    data = serialize_bitmap_array(indexes)
    assert deserialize_bitmap_array(data).tolist() == sorted(set(indexes))


@given(st.integers(0, 65535), st.integers(1, 6000))
@settings(max_examples=50, deadline=None)
def test_roaring_dense_run_crosses_container_kinds(start, length):
    # contiguous runs cross the 4096-cardinality array/bitset boundary
    idx = list(range(start, start + length))
    assert deserialize_bitmap_array(
        serialize_bitmap_array(idx)).tolist() == idx


@given(st.lists(st.lists(st.integers(0, 10**6), min_size=0, max_size=50),
                min_size=1, max_size=5))
@settings(max_examples=50, deadline=None)
def test_dv_file_framing_roundtrip(bitmap_sets):
    import os
    import tempfile

    datas = [serialize_bitmap_array(s) for s in bitmap_sets]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "dv.bin")
        offsets = write_dv_file(p, datas)
        blob = open(p, "rb").read()
        for (off, size), data in zip(offsets, datas):
            assert read_dv_from_file_bytes(blob, off, size) == data


@given(st.lists(st.binary(min_size=0, max_size=200), min_size=0,
                max_size=8),
       st.dictionaries(st.text(min_size=1, max_size=10),
                       st.text(max_size=20), max_size=3))
@settings(max_examples=200, deadline=None)
def test_puffin_container_roundtrip(blob_datas, props):
    """Puffin container: any blob byte sequence round-trips through the
    footer's offset/length bookkeeping; file properties survive."""
    import os
    import tempfile

    from databricks_import_pyspark_scripts_spark.sources import puffin

    path = os.path.join(tempfile.mkdtemp(), "t.puffin")
    blobs = [{"type": "deletion-vector-v1", "data": b,
              "properties": {"i": str(i)}}
             for i, b in enumerate(blob_datas)]
    puffin.write_puffin_file(path, blobs, file_properties=props)
    raw = open(path, "rb").read()
    ft = puffin.read_puffin_footer(raw)
    assert ft["properties"] == dict(props)
    assert len(ft["blobs"]) == len(blob_datas)
    for i, (b, d) in enumerate(zip(ft["blobs"], blob_datas)):
        assert puffin.read_puffin_blob(raw, b["offset"], b["length"]) == d
        assert b["properties"]["i"] == str(i)


@given(st.lists(st.integers(0, 2**40), min_size=0, max_size=300,
                unique=True))
@settings(max_examples=200, deadline=None)
def test_dv_bitmap_roundtrip_large_positions(positions):
    """RoaringBitmapArray codec (shared by Delta DVs and Iceberg v3
    puffin DVs): arbitrary 40-bit row positions round-trip exactly —
    multi-bitmap keys, runs, and singletons alike."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.sources import delta_dv

    arr = np.sort(np.asarray(positions, dtype=np.int64))
    got = delta_dv.deserialize_bitmap_array(
        delta_dv.serialize_bitmap_array(arr))
    assert (got == arr).all() and got.dtype == np.int64


# r13 codecs: JPEG / WAV / AVI round-trip properties


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.integers(0, 2 ** 32 - 1),
       st.sampled_from([1, 2, 8, 16]))
def test_jpeg_roundtrip_bounded_error(bh, bw, seed, q):
    """Baseline JPEG encode->decode with a uniform quantization table is
    bounded by q/2 + IDCT rounding per pixel, at every geometry
    (including non-multiple-of-8 crops via edge padding)."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(seed)
    h, w = bh * 8 - rng.integers(0, 7), bw * 8 - rng.integers(0, 7)
    a = rng.integers(0, 256, (int(h), int(w)), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(
        a, quant=np.full((8, 8), q, np.int32)))
    assert out.shape == a.shape
    # worst case: 64 coefficients each off by q/2 through the
    # orthonormal IDCT -> per-pixel bound 8 * (q/2) + rounding
    bound = 4 * q + 2
    assert int(np.abs(out.astype(int) - a.astype(int)).max()) <= bound


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 2000), st.integers(0, 2 ** 32 - 1),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_exact_quantization(n, seed, rate):
    """WAV 16-bit PCM encode->decode reproduces samples to one
    quantization step and preserves the sample rate and count."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators.wav_codec import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    s = rng.uniform(-1, 1, n)
    out, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate and len(out) == n
    # decoded = round(s*32767)/32768: rounding (0.5/32768) plus the
    # 32767-vs-32768 scale asymmetry (|s|/32768) -> 1.5/32768 bound
    assert float(np.abs(out - s).max()) <= 1.5 / 32768 + 1e-12


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 2000), st.integers(0, 2 ** 32 - 1),
       st.sampled_from([8000, 16000, 44100]),
       st.sampled_from([32, 64]))
def test_wav_ieee_float_roundtrip(n, seed, rate, bits):
    """IEEE-float WAV (format tag 3, 32/64-bit — VERDICT r13 #7)
    round-trips to float32 precision (exactly at 64-bit) and
    preserves rate and count."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators.wav_codec import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    s = rng.uniform(-1, 1, n)
    out, got_rate = decode_wav(encode_wav(s, rate, fmt_tag=3,
                                          bits=bits))
    assert got_rate == rate and len(out) == n
    tol = 0.0 if bits == 64 else 1e-7
    assert float(np.abs(out - s).max()) <= tol


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(min_size=1, max_size=64), min_size=1,
                max_size=8),
       st.sampled_from([1, 5, 10, 30]))
def test_avi_container_roundtrip_any_payloads(payloads, fps):
    """The AVI container round-trips arbitrary frame payloads (the
    container does not inspect JPEG bytes — parse yields them verbatim,
    odd lengths word-aligned) and the frame cadence."""
    from databricks_import_pyspark_scripts_spark.operators.avi_codec import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )

    avi = encode_avi_mjpeg(list(payloads), fps=fps)
    meta = parse_avi_mjpeg(avi)
    assert meta["frames"] == list(payloads)
    assert meta["usec_per_frame"] == 1_000_000 // fps
