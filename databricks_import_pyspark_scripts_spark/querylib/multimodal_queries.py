"""Multimodal plumbing queries. The media table is synthesized
deterministically (no media testdata exists), the decode step uses the
deterministic md5-derived fake decoder (real codecs are stubbed —
operators.multimodal), and the oracle reproduces the identical math in
DuckDB — so even the mapInPandas Arrow path is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    IMAGE_FEATURE_DIM,
    deterministic_fake_decoder,
    frame_sample_plan,
    image_features,
    synthesize_media_table,
)
from . import register

N_MEDIA = 256

# hex pair at byte i of md5('payload-' || id) -> integer 0..255, portably
_HEX = "0123456789abcdef"


def _byte_sql(i: int) -> str:
    h = "md5('payload-' || CAST(media_id AS VARCHAR))"
    return (f"((instr('{_HEX}', substr({h}, {2 * i + 1}, 1)) - 1) * 16"
            f" + instr('{_HEX}', substr({h}, {2 * i + 2}, 1)) - 1)")


_FEATURE_SUM_SQL = " + ".join(f"{_byte_sql(i)} / 255.0"
                              for i in range(IMAGE_FEATURE_DIM))


@register(
    "multimodal_image_features",
    f"""
    SELECT media_id, 'image/png' AS mime,
           {IMAGE_FEATURE_DIM} AS dim,
           ROUND({_FEATURE_SUM_SQL}, 4) AS feature_sum
    FROM range(0, {N_MEDIA}) t(media_id)
    WHERE media_id % 3 = 0
    """,
    doc="Binary media column -> metadata-filtered mapInPandas decode "
        "(Arrow-batched) -> per-image feature vector; reduced to a rounded "
        "sum so the md5-derived fake decode is value-checked cross-engine.")
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media_table(spark, N_MEDIA)
    feats = image_features(media, decoder=deterministic_fake_decoder)
    as_double = F.transform(F.col("feature"), lambda x: x.cast("double"))
    return feats.select(
        "media_id", "mime",
        F.size("feature").alias("dim"),
        F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), 4)
        .alias("feature_sum"))


@register(
    "multimodal_frame_plan",
    f"""
    SELECT media_id, frame_ts_ms
    FROM (SELECT media_id, (media_id % 10 + 1) * 2000 AS duration_ms
          FROM range(0, {N_MEDIA}) t(media_id)
          WHERE media_id % 3 = 2),
         LATERAL unnest(generate_series(0, CAST(duration_ms - 1 AS BIGINT), 1000))
           AS u(frame_ts_ms)
    """,
    doc="Video frame-sampling plan from metadata only (sequence+explode, "
        "JVM-side, zero decodes): one row per planned frame.")
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media_table(spark, N_MEDIA)
    return frame_sample_plan(media, every_ms=1000)


DUP_MOD = 40  # payload seed modulus: 256 assets -> 40 distinct payloads


@register(
    "multimodal_asset_dedup",
    f"""
    SELECT md5('payload-' || CAST(media_id % {DUP_MOD} AS VARCHAR))
             AS content_md5,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(media_id) AS canonical_id
    FROM range(0, {N_MEDIA}) t(media_id)
    GROUP BY 1
    """,
    doc="Exact dedup for binary media assets: md5 over the raw content "
        "bytes (JVM-side, no decode), group to copy-count + min-id "
        "canonical asset — the first stage of any multimodal ingest (most "
        "crawled media duplicates byte-identically). The duplicate-bearing "
        "corpus is synthesized by modding the payload seed; Spark hashes "
        "the actual BINARY column, the oracle the identical utf-8 string.")
def multimodal_asset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media_table(spark, N_MEDIA)
    dup_content = F.encode(
        F.concat(F.lit("payload-"),
                 (F.col("media_id") % DUP_MOD).cast("string")), "utf-8")
    return (media
            .select("media_id", F.md5(dup_content).alias("content_md5"))
            .groupBy("content_md5")
            .agg(F.count("*").cast("long").alias("n_copies"),
                 F.min("media_id").alias("canonical_id")))


_PHASH_N, _PHASH_VARIANTS = 60, 10


@register(
    "multimodal_phash_near_dup",
    f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM documents a JOIN documents b
      ON a.doc_id < b.doc_id
     AND a.doc_id // {_PHASH_VARIANTS} = b.doc_id // {_PHASH_VARIANTS}
    WHERE a.doc_id < {_PHASH_N} AND b.doc_id < {_PHASH_N}
    """,
    doc="Perceptual-hash near-dup over REAL PNG bytes (operators/"
        "png_codec.py — VERDICT r11 #5): a deterministic 60-image corpus "
        "(6 clusters x 10 variants; each variant byte-distinct via "
        "brightness shift + block-mean-preserving checkerboard, scanline "
        "filters cycling through all five PNG filter types) is decoded by "
        "the stdlib zlib+numpy codec inside Arrow-batched mapInPandas, "
        "block-mean aHashed (16-bit), LSH-banded, and hamming-verified. "
        "The construction makes within-cluster hashes bit-identical and "
        "cross-cluster hashes differ in >= 8 bits, so the exact expected "
        "pair set is the oracle's id arithmetic: any decode, unfilter, "
        "hash, banding, or pairing defect changes the pairs.")
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import PHASH_DIM, phash_pairs, \
        synthesize_png_corpus
    from ..sources.registry import load_table

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") < _PHASH_N)
           .select("doc_id").collect()]          # gate-scale fixture ids
    media = synthesize_png_corpus(spark, ids,
                                  variants_per_cluster=_PHASH_VARIANTS)
    return (phash_pairs(media, dim=PHASH_DIM, num_bands=2, max_hamming=1)
            .select("id_a", "id_b",
                    F.col("hamming").cast("long").alias("hamming")))


@register(
    "multimodal_phash_near_dup_jpeg",
    f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM documents a JOIN documents b
      ON a.doc_id < b.doc_id
     AND a.doc_id // {_PHASH_VARIANTS} = b.doc_id // {_PHASH_VARIANTS}
    WHERE a.doc_id < {_PHASH_N} AND b.doc_id < {_PHASH_N}
    """,
    doc="Perceptual-hash near-dup over REAL baseline JPEG bytes "
        "(operators/jpeg_codec.py — VERDICT r12 #7, the dominant real-"
        "corpus format): the PNG gate's 60-image construction encoded "
        "through the stdlib huffman+FDCT encoder with per-variant "
        "uniform quantization steps, decoded by the stdlib huffman+IDCT "
        "decoder inside Arrow-batched mapInPandas, block-mean aHashed "
        "(16-bit), LSH-banded, hamming-verified. Quantization shifts "
        "block means by < q/2 against a 150-step margin, so the exact "
        "expected pair set is still the oracle's id arithmetic: any "
        "marker-parse, huffman, dequantize, IDCT, hash, banding, or "
        "pairing defect changes the pairs.")
def multimodal_phash_near_dup_jpeg(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from ..operators.multimodal import PHASH_DIM, phash_pairs, \
        synthesize_jpeg_corpus
    from ..sources.registry import load_table

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") < _PHASH_N)
           .select("doc_id").collect()]          # gate-scale fixture ids
    media = synthesize_jpeg_corpus(spark, ids,
                                   variants_per_cluster=_PHASH_VARIANTS)
    return (phash_pairs(media, dim=PHASH_DIM, num_bands=2, max_hamming=1)
            .select("id_a", "id_b",
                    F.col("hamming").cast("long").alias("hamming")))


@register(
    "multimodal_audio_near_dup",
    f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM documents a JOIN documents b
      ON a.doc_id < b.doc_id
     AND a.doc_id // {_PHASH_VARIANTS} = b.doc_id // {_PHASH_VARIANTS}
    WHERE a.doc_id < {_PHASH_N} AND b.doc_id < {_PHASH_N}
    """,
    doc="Audio near-dup over REAL WAV bytes (operators/wav_codec.py — "
        "the audio tier's planning-only gap closed): a deterministic "
        "60-clip corpus (6 clusters x 10 variants; each variant "
        "byte-distinct via global gain + carrier-frequency changes "
        "that preserve per-segment RMS ordering) is decoded by the "
        "stdlib RIFF/PCM codec inside Arrow-batched mapInPandas, "
        "energy-envelope fingerprinted (16 segment-RMS aHash bits, "
        "gain-invariant), LSH-banded, hamming-verified. Within-cluster "
        "fingerprints are bit-identical, cross-cluster >= 8/16 bits "
        "apart, so the oracle is the construction's exact id "
        "arithmetic: any RIFF-parse, PCM-scale, segmentation, RMS, "
        "hash, banding, or pairing defect changes the pairs.")
def multimodal_audio_near_dup(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        audio_fingerprint_pairs,
        synthesize_wav_corpus,
    )
    from ..sources.registry import load_table

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") < _PHASH_N)
           .select("doc_id").collect()]          # gate-scale fixture ids
    media = synthesize_wav_corpus(spark, ids,
                                  variants_per_cluster=_PHASH_VARIANTS)
    return (audio_fingerprint_pairs(media, num_bands=2, max_hamming=1)
            .select("id_a", "id_b",
                    F.col("hamming").cast("long").alias("hamming")))


@register(
    "multimodal_video_frame_phash",
    f"""
    SELECT d.doc_id AS media_id, u.frame_ts_ms,
           CAST(CASE d.doc_id // {_PHASH_VARIANTS}
                WHEN 0 THEN 255 WHEN 1 THEN 65280 WHEN 2 THEN 3855
                WHEN 3 THEN 61680 WHEN 4 THEN 15420 ELSE 50115
                END AS BIGINT) AS phash
    FROM documents d,
         LATERAL unnest(generate_series(0, 599, 200)) AS u(frame_ts_ms)
    WHERE d.doc_id < {_PHASH_N}
    """,
    doc="REAL video frame sampling + decode (operators/avi_codec.py + "
        "frame_sample_features — the planning-only frame tier closed): "
        "60 MJPEG-AVI clips (6 clusters x 10 variants, 6 frames each, "
        "every frame byte-distinct via brightness shifts) are container-"
        "parsed, sampled every 200 ms, and ONLY the sampled frames "
        "JPEG-decoded to block means inside Arrow-batched mapInPandas; "
        "each frame's aHash equals its cluster's 16-bit pattern integer "
        "EXACTLY by construction, so the oracle enumerates "
        "(media_id, ts, pattern) arithmetically: any container-parse, "
        "frame-index, sampling-cadence, JPEG-decode, or hash defect "
        "changes rows or values.")
def multimodal_video_frame_phash(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        PHASH_DIM,
        frame_sample_features,
        phash_col,
        synthesize_avi_corpus,
    )
    from ..sources.registry import load_table

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") < _PHASH_N)
           .select("doc_id").collect()]          # gate-scale fixture ids
    media = synthesize_avi_corpus(spark, ids,
                                  variants_per_cluster=_PHASH_VARIANTS,
                                  frames_per_video=6, fps=10)
    feats = frame_sample_features(media, every_ms=200)
    return feats.select(
        "media_id", "frame_ts_ms",
        phash_col(F.col("feature"), PHASH_DIM).alias("phash"))


@register(
    "multimodal_audio_dominant_freq",
    f"""
    SELECT d.doc_id AS media_id, u.segment,
           CAST((5 + (d.doc_id * 7 + u.segment * 3) % 20) * 20 AS BIGINT)
             AS freq_hz
    FROM documents d,
         LATERAL unnest(generate_series(0, 15, 1)) AS u(segment)
    WHERE d.doc_id < {_PHASH_N}
    """,
    doc="Audio FREQUENCY analysis over real WAV bytes (operators/"
        "wav_codec.py dominant_freq_features — numpy rFFT per segment, "
        "DC excluded): 60 clips whose 16 segments each carry a pure "
        "sine of 5 + (id*7 + seg*3) % 20 FULL cycles land exactly on "
        "FFT bin k, i.e. k * sample_rate / seg_len = k*20 Hz. Decode + "
        "spectral featurize run in Arrow-batched mapInPandas; the "
        "posexplode to (media_id, segment, freq_hz) is JVM-side. The "
        "oracle enumerates every expected bin arithmetically: a PCM "
        "scaling, segmentation, FFT-windowing, or argmax defect moves "
        "bins.")
def multimodal_audio_dominant_freq(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    import numpy as np

    from ..operators.multimodal import MEDIA_SCHEMA, audio_features
    from ..operators.wav_codec import encode_wav, wav_spectral_decoder
    from ..sources.registry import load_table
    from pyspark.sql.types import LongType, StructField, StructType

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") < _PHASH_N)
           .select("doc_id").collect()]          # gate-scale fixture ids
    seg = 800
    t = np.arange(seg) / seg
    rows = []
    for i in ids:
        parts = [0.5 * np.sin(2 * np.pi * (5 + (i * 7 + s * 3) % 20) * t)
                 for s in range(16)]
        # every third clip is IEEE-float WAV (format tag 3 — VERDICT
        # r13 #7): same spectra, so the oracle pins the float decode
        wav = encode_wav(np.concatenate(parts), 16000,
                         fmt_tag=3 if i % 3 == 2 else 1)
        rows.append((int(i), (wav, "audio/wav", None, None, 16000, 1,
                              16 * seg * 1000 // 16000)))
    media = spark.createDataFrame(
        rows, StructType([StructField("media_id", LongType()),
                          StructField("media", MEDIA_SCHEMA)]))
    feats = audio_features(media, decoder=wav_spectral_decoder(16))
    return (feats.select(
        "media_id",
        F.posexplode("feature").alias("segment", "hz"))
        .select("media_id", F.col("segment").cast("int").alias("segment"),
                F.col("hz").cast("long").alias("freq_hz")))


@register(
    "multimodal_mp4_frame_plan",
    f"""
    SELECT d.doc_id AS media_id, u.sample_idx,
           CAST(u.sample_idx * 100 AS BIGINT) AS frame_ts_ms,
           'jpeg' AS codec
    FROM documents d,
         LATERAL unnest(generate_series(0, d.doc_id % 5 + 1, 1))
           AS u(sample_idx)
    WHERE d.doc_id < {_PHASH_N}
    """,
    doc="ISO-BMFF (MP4) container parsing for frame-sample planning "
        "(operators/mp4_codec.py — VERDICT r13 #5): 60 hand-assembled "
        "MP4 files (golden-bytes encoder; doc_id % 5 + 2 JPEG samples "
        "each at 10 fps, multi-chunk stsc layout) are parsed "
        "moov/trak/stbl — stts expands per-sample timestamps, "
        "stsc+stsz+stco place every sample — with ZERO codec decodes, "
        "inside Arrow-batched mapInPandas. One row per planned sample; "
        "the oracle enumerates (media_id, idx, idx*100ms, 'jpeg') "
        "arithmetically, so any box-walk, sample-table expansion, or "
        "timescale defect changes rows.")
def multimodal_mp4_frame_plan(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    from ..operators.jpeg_codec import encode_jpeg_gray
    from ..operators.mp4_codec import encode_mp4_jpeg
    from ..operators.multimodal import MEDIA_SCHEMA, mp4_frame_plan
    from ..sources.registry import load_table

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") < _PHASH_N)
           .select("doc_id").collect()]          # gate-scale fixture ids
    rows = []
    for i in ids:
        nf = int(i) % 5 + 2
        frames = [encode_jpeg_gray(
            np.full((8, 8), (int(i) * 16 + f) % 256, np.uint8))
            for f in range(nf)]
        mp4 = encode_mp4_jpeg(frames, fps=10, width=8, height=8)
        rows.append((int(i), (mp4, "video/mp4", 8, 8, None, None,
                              nf * 100)))
    media = spark.createDataFrame(
        rows, StructType([StructField("media_id", LongType()),
                          StructField("media", MEDIA_SCHEMA)]))
    return mp4_frame_plan(media).select(
        "media_id", "sample_idx", "frame_ts_ms", "codec")


@register(
    "multimodal_mp4_frame_phash",
    f"""
    SELECT d.doc_id AS media_id, u.frame_ts_ms,
           CAST(CASE d.doc_id // {_PHASH_VARIANTS}
                WHEN 0 THEN 255 WHEN 1 THEN 65280 WHEN 2 THEN 3855
                WHEN 3 THEN 61680 WHEN 4 THEN 15420 ELSE 50115
                END AS BIGINT) AS phash
    FROM documents d,
         LATERAL unnest(generate_series(0, 599, 200)) AS u(frame_ts_ms)
    WHERE d.doc_id < {_PHASH_N}
    """,
    doc="REAL MP4 frame sampling + decode (operators/mp4_codec.py + "
        "frame_sample_features — the AVI gate's ISO-BMFF twin): 60 MP4 "
        "clips with QuickTime 'jpeg' samples (6 clusters x 10 "
        "variants, 6 frames each, every frame byte-distinct, "
        "multi-chunk stsc layout) are container-parsed via "
        "parse_mp4_mjpeg, sampled every 200 ms, and ONLY the sampled "
        "frames JPEG-decoded to block means inside Arrow-batched "
        "mapInPandas (lazy byte-slice frame access — unsampled frames "
        "never materialize); each frame's aHash equals its cluster's "
        "16-bit pattern integer exactly, so the oracle enumerates "
        "(media_id, ts, pattern) arithmetically.")
def multimodal_mp4_frame_phash(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.mp4_codec import parse_mp4_mjpeg
    from ..operators.multimodal import (
        PHASH_DIM,
        frame_sample_features,
        phash_col,
        synthesize_mp4_corpus,
    )
    from ..sources.registry import load_table

    ids = [r.doc_id for r in
           load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") < _PHASH_N)
           .select("doc_id").collect()]          # gate-scale fixture ids
    media = synthesize_mp4_corpus(spark, ids,
                                  variants_per_cluster=_PHASH_VARIANTS,
                                  frames_per_video=6, fps=10)
    feats = frame_sample_features(
        media, every_ms=200,
        parser=lambda raw: parse_mp4_mjpeg(raw))
    return feats.select(
        "media_id", "frame_ts_ms",
        phash_col(F.col("feature"), PHASH_DIM).alias("phash"))
