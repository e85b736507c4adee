"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

North-star extensions (SURVEY.md §7 Phase 5) built for 100 TB:

* **exact**: hash-groupBy on content (or md5 fingerprint) — one shuffle on
  the dedup key, map-side partial agg; never collects to the driver.
* **MinHash-LSH**: shingles -> per-hash min signature -> banded bucket hash ->
  self-join on (band, bucket) for candidates -> exact Jaccard verify. The
  candidate join is an equi-join on the band hash, so the shuffle volume is
  O(docs x bands), NOT O(docs^2); skewed buckets are AQE-split.
* **SimHash**: 60-bit bit-majority signature from token md5s; near-dup pairs
  join on 15-bit bands (pigeonhole: hamming<=3 leaves >=1 of 4 bands intact).
* **n-gram Jaccard**: exact verify step, also usable standalone within
  same-language blocks.

Portability: every hash is md5-derived. md5 is the one hash function Spark
and DuckDB implement identically, which is what lets the driver's DuckDB
oracle value-match even the LSH pipeline (the usual murmur/xxhash builtins
differ across engines). MinHash minima are taken over md5 HEX STRINGS
lexicographically — a valid uniform minhash that sidesteps hex->int
conversion (DuckDB has no conv()).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import TOKEN_PATTERN, shingles_col, tokens_col

# MinHash configuration shared by the Spark implementation and the generated
# DuckDB oracle SQL (querylib.dedup builds the SQL from these constants).
NUM_HASHES = 16
NUM_BANDS = 4          # 4 bands x 4 rows: catches ~Jaccard >= ~0.6 candidates
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
SHINGLE_K = 3

# 60 bits = 15 md5 hex chars x 4 bits. 60, not 64: both engines do signed
# 64-bit integer arithmetic, so a 60-bit non-negative code keeps every
# operation (sum of 2^i terms, // banding, xor, bit_count) exact and portable
# with zero sign-bit special cases. Band cardinality is what kills or saves
# LSH at scale: 4 bands x 15 bits = 32768 values per band, so the band
# self-join fans out O(n x bands) with ~n/32768 docs per bucket — vs the
# earlier 16-bit/4-bit-band design whose 16 possible band values made the
# join quadratic (~4n^2/16) on any large corpus.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4      # pigeonhole minimum for hamming <= SIMHASH_BANDS-1 = 3
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15 -> 2^15 band values

# Degenerate-bucket guard for bucket_pairs. LSH banding bounds the EXPECTED
# bucket size (~n/2^band_bits), but an adversarial corpus — millions of
# byte-identical documents — lands its whole duplicate mass in one bucket and
# the within-bucket pair explode goes quadratic (10M ids -> ~5e13 pairs).
# The contract is: exact-duplicate mass MUST be collapsed to one
# representative before near-dup LSH (collapse_exact_reps — wired into
# minhash_lsh_pairs and the embedding dedup query by default); the cap is the
# safety valve for near-identical-but-not-exact mass that survives collapse.
# An honest near-dup bucket larger than this is indistinguishable from "these
# are all duplicates of each other" — pair-level resolution adds nothing.
MAX_BUCKET = 1000


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """One representative row id (the min id) per distinct key tuple.

    Deterministic (unlike dropDuplicates, which keeps an arbitrary row) and
    scale-clean: single hash-shuffle on the key columns.
    """
    return (df.groupBy(*key_cols)
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("n_copies")))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = NUM_HASHES,
                       k: int = SHINGLE_K) -> DataFrame:
    """(id, sig0..sigN-1): per-document minhash signature.

    Shape: explode shingles -> ONE md5 per shingle -> two 52-bit integers
    (h1, h2) from its hex halves -> hash-agg MIN(h1 + j*h2) per doc for the
    num_hashes affine hash functions. Why this exact shape:

    * explode + hash-agg, NOT an array fold: Spark's higher-order-function
      lambdas run interpreted (no codegen), measured ~10x slower; the
      exploded form also gets map-side partial aggregation, so at 100 TB the
      shuffle carries only |docs| x num_hashes minima, never the shingles.
    * affine family over one md5, NOT num_hashes independent md5s: 16x less
      hashing, and the aggregate's generated code is tiny integer ops
      instead of 16 string-hash pipelines (wide string-min aggs measured
      multi-second whole-stage-codegen compile times).
    * h1/h2 are 13-hex-digit (52-bit) values so h1 + 15*h2 < 2^56 — exact
      in both int64 and float64, hence portable to any oracle engine.
    """
    base = df.select(F.col(id_col), F.col(text_col))
    # Spread the hash-heavy explode across all cores even when the source is
    # a single (unsplittable) file; hash-partitioning on the id also makes
    # the groupBy below shuffle-free and lets the self-join in
    # minhash_lsh_pairs reuse this exchange for both sides.
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    h = F.md5(F.col("s"))
    exploded = (base.select(
        F.col(id_col),
        F.explode(shingles_col(F.col(text_col), k)).alias("s"))
        .select(F.col(id_col),
                F.conv(F.substring(h, 1, 13), 16, 10).cast("long").alias("h1"),
                F.conv(F.substring(h, 14, 13), 16, 10).cast("long").alias("h2")))
    return exploded.groupBy(id_col).agg(*[
        F.min(F.col("h1") + F.lit(j) * F.col("h2")).alias(f"sig{j}")
        for j in range(num_hashes)
    ])


_TOKEN_RE = re.compile(TOKEN_PATTERN)

# shared shingle-md5 memo for the Arrow signature path (see _sigs): lives in
# the Python worker process, so it persists across Arrow batches of the same
# executor and is rebuilt per worker — never shipped, never a correctness
# input. Both caps are load-bearing for the memory bound: entry count alone
# does not bound bytes when shingles are built from pathological tokens
# (URLs, base64, minified JS), so keys longer than _SIGS_MEMO_MAX_KEY are
# hashed but never memoized. Worst case ~= 2^18 * (256 B + overhead) ~ 50 MB
# per worker.
_sigs_memo: dict[str, tuple[int, int]] = {}
_SIGS_MEMO_MAX = 1 << 18
_SIGS_MEMO_MAX_KEY = 256


def _py_shingles(text: str, k: int) -> list[str]:
    """Python twin of ``shingles_col`` (same regex, same join, distinct),
    shared by the Arrow signature and shingle paths so they cannot drift."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        return [" ".join(toks)]
    # dict.fromkeys = distinct; set SEMANTICS are what downstream consumers
    # rely on (min over hashes, intersect/union sizes), so order is free
    return list(dict.fromkeys(
        " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)))


def shingles_pd_df(df: DataFrame, id_col: str, text_col: str,
                   k: int = SHINGLE_K,
                   extra_cols: list[str] | None = None) -> DataFrame:
    """(id, *extra_cols, sh): distinct shingle arrays via an Arrow batch UDF.

    Same sets as ``shingles_col`` but ~10x faster on a corpus-wide
    projection: the expression form's nested transform/slice lambdas run
    interpreted (measured 2.3 s single-threaded at sf0.1 — the dominant
    cost of the LSH verify stage), while this is one Python pass per Arrow
    batch, repartitioned across cores. Element ORDER differs from the
    expression form; every consumer (Jaccard intersect/union sizes) is
    order-insensitive by construction. ``extra_cols`` ride the same
    projection (the UDF is a column expression), so blocked consumers
    don't need a join to reattach their block keys.
    """

    @pandas_udf("array<string>")
    def _sh(texts: pd.Series) -> pd.Series:
        return pd.Series([
            None if t is None else _py_shingles(t, k) for t in texts])

    extra = [F.col(c) for c in (extra_cols or [])]
    base = df.select(F.col(id_col), *extra, F.col(text_col))
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    return base.select(F.col(id_col), *extra,
                       _sh(F.col(text_col)).alias("sh"))


def minhash_signatures_pd(df: DataFrame, id_col: str, text_col: str,
                          num_hashes: int = NUM_HASHES,
                          k: int = SHINGLE_K) -> DataFrame:
    """Arrow fast path for ``minhash_signatures`` — bit-identical signatures.

    One vectorized pass per Arrow batch replaces the explode + 16-column
    hash-aggregate: tokenize/shingle in Python (same regex, same join
    semantics as ``shingles_col``), one md5 per distinct shingle, then the
    16 affine minima as a single numpy (shingles x hashes) min-reduction.
    All integer math is int64 on values < 2^56 (13 hex digits + j*13 hex
    digits), so there is no precision seam with the JVM or DuckDB forms —
    ``tests/test_impl_consistency.py`` asserts frame equality on the real
    documents table.

    Why this wins: the exploded form shuffles |shingles| rows through a
    16-way min aggregate and burns md5+conv string codegen per shingle; here
    the md5 is one C call per shingle and the minima never leave the batch.
    Same pattern as ``similarity.lsh_table_buckets_pd_df`` (measured 8.8 s
    -> sub-second on its operator).

    NULL texts yield a row with all-NULL signature columns, exactly like the
    exploded form: there, the lone NULL shingle flows md5(NULL) -> NULL
    h1/h2 -> NULL minima (NULL text does NOT drop the document).
    """
    @pandas_udf("array<long>")
    def _sigs(texts: pd.Series) -> pd.Series:
        js = np.arange(num_hashes, dtype=np.int64)
        # per-worker bounded md5 memo: shingles repeat heavily across
        # documents (measured ~10 instances per distinct 3-shingle on the
        # sf0.1 corpus), and the memo halves the hash stage's CPU
        # (0.52 s -> 0.29 s single-threaded at sf0.1). The cap bounds
        # worker memory (~25 MB); past it the code degrades to plain
        # hashing. Values are unchanged — same md5, same parses.
        memo = _sigs_memo
        out: list = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            sh = _py_shingles(t, k)
            h1 = np.empty(len(sh), dtype=np.int64)
            h2 = np.empty(len(sh), dtype=np.int64)
            for ix, s in enumerate(sh):
                v = memo.get(s)
                if v is None:
                    d = hashlib.md5(s.encode("utf-8")).hexdigest()  # noqa: S324
                    v = (int(d[:13], 16), int(d[13:26], 16))
                    if (len(memo) < _SIGS_MEMO_MAX
                            and len(s) <= _SIGS_MEMO_MAX_KEY):
                        memo[s] = v
                h1[ix], h2[ix] = v
            out.append((h1[:, None] + js[None, :] * h2[:, None]).min(axis=0))
        return pd.Series(out)

    base = df.select(F.col(id_col), F.col(text_col))
    # spread hash work across all cores even from a single-file source
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    arr = base.select(F.col(id_col), _sigs(F.col(text_col)).alias("sigs"))
    return arr.select(F.col(id_col), *[
        F.col("sigs").getItem(j).alias(f"sig{j}") for j in range(num_hashes)])


def shingle_sig_pd_df(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = NUM_HASHES,
                      k: int = SHINGLE_K) -> DataFrame:
    """(id, sh, sig0..sigN-1): shingle arrays AND minhash signatures from
    ONE tokenize pass (r14 batch 12). ``minhash_signatures_pd`` already
    runs ``_py_shingles`` per document to hash them — when a caller needs
    BOTH the signatures and the shingle sets of the SAME rows (the
    incremental near-dup's new batch: bands for the probe, shingles for
    the verify), emitting the shingles alongside is free compute; the only
    cost is the extra bytes, which is why this exists as a separate
    function instead of replacing ``minhash_signatures_pd`` — corpus-scale
    callers must keep shipping signatures only (guide §8: shuffle keys,
    not payloads).

    Same ``_py_shingles`` twin, same md5 memo, same affine minima as
    ``minhash_signatures_pd``/``shingles_pd_df`` — sh and sig values are
    bit-identical to the separate passes (pinned by
    test_impl_consistency.test_fused_shingle_sig_matches_separate).
    NULL text -> NULL sh and NULL signatures, exactly like both parents.
    """
    @pandas_udf("struct<sh:array<string>,sigs:array<long>>")
    def _both(texts: pd.Series) -> pd.DataFrame:
        js = np.arange(num_hashes, dtype=np.int64)
        memo = _sigs_memo
        shs: list = []
        sigs: list = []
        for t in texts:
            if t is None:
                shs.append(None)
                sigs.append(None)
                continue
            sh = _py_shingles(t, k)
            h1 = np.empty(len(sh), dtype=np.int64)
            h2 = np.empty(len(sh), dtype=np.int64)
            for ix, s in enumerate(sh):
                v = memo.get(s)
                if v is None:
                    d = hashlib.md5(s.encode("utf-8")).hexdigest()  # noqa: S324
                    v = (int(d[:13], 16), int(d[13:26], 16))
                    if (len(memo) < _SIGS_MEMO_MAX
                            and len(s) <= _SIGS_MEMO_MAX_KEY):
                        memo[s] = v
                h1[ix], h2[ix] = v
            shs.append(sh)
            sigs.append((h1[:, None] + js[None, :] * h2[:, None]).min(axis=0))
        return pd.DataFrame({"sh": shs, "sigs": sigs})

    base = df.select(F.col(id_col), F.col(text_col))
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    arr = base.select(F.col(id_col), _both(F.col(text_col)).alias("_f"))
    return arr.select(F.col(id_col), F.col("_f.sh").alias("sh"), *[
        F.col("_f.sigs").getItem(j).alias(f"sig{j}")
        for j in range(num_hashes)])


def _bands_from_sigs(sigs: DataFrame, id_col: str,
                     num_hashes: int = NUM_HASHES,
                     num_bands: int = NUM_BANDS) -> DataFrame:
    """(id, band_idx, band_hash) from a (id, sig0..sigN-1) frame — the one
    band derivation every LSH path shares."""
    rows = num_hashes // num_bands
    bands = F.array(*[
        F.struct(F.lit(b).alias("band_idx"),
                 F.md5(F.concat_ws(",", *[F.col(f"sig{j}").cast("string")
                                          for j in range(b * rows, (b + 1) * rows)]))
                 .alias("band_hash"))
        for b in range(num_bands)
    ])
    return (sigs.select(F.col(id_col), F.explode(bands).alias("band"))
            .select(id_col, "band.band_idx", "band.band_hash"))


def minhash_bands(df: DataFrame, id_col: str, text_col: str,
                  num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
                  k: int = SHINGLE_K, use_arrow: bool = True) -> DataFrame:
    """(id, band_idx, band_hash): one row per band per document."""
    sig_fn = minhash_signatures_pd if use_arrow else minhash_signatures
    sigs = sig_fn(df, id_col, text_col, num_hashes, k)
    return _bands_from_sigs(sigs, id_col, num_hashes, num_bands)


def jaccard_col(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def collapse_exact_reps(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) with exact-duplicate texts collapsed to the min-id
    representative (dedup on the token-normalized md5 fingerprint, the same
    key ``exact_dedup`` queries use).

    The mandatory pre-pass before near-dup LSH on a duplicate-heavy corpus:
    N byte-identical documents produce N identical signatures, land in one
    LSH bucket, and explode ~N^2/2 candidate pairs — all of which carry zero
    information (exact duplicates ARE duplicates; no verify needed). One
    hash shuffle on the fingerprint; min_by keeps the representative's text
    deterministically (and any member's text would do — equal fingerprints
    mean equal token streams, hence equal shingles and signatures).

    Members map to their representative via ``exact_dedup`` output; near-dup
    pairs among representatives then extend to members transitively.

    Shuffle shape: the fingerprint groupBy carries ONLY (fp, id) — 16-byte
    rows — never the texts (the earlier ``min_by(text)`` form shuffled the
    whole corpus text through the aggregate). Texts come back via a semi-join
    on the representative ids: AQE broadcasts the id list when it is small,
    and at 100 TB the semi-join's hash exchange on ``id`` is the same
    partitioning the downstream signature stage repartitions to anyway, so
    the text movement it adds was already being paid there.
    """
    fp = df.select(F.col(id_col),
                   F.md5(F.array_join(tokens_col(F.col(text_col)), " "))
                   .alias("_fp"))
    reps = (fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return (df.join(reps, id_col, "left_semi")
            .select(F.col(id_col), F.col(text_col)))


def bucket_pairs(bands: DataFrame, bucket_cols: list[str],
                 item_col: Column,
                 max_bucket: int | None = None) -> DataFrame:
    """All unordered within-bucket pairs: group rows by ``bucket_cols``,
    sort each bucket's items, explode every (i < j) combination as
    ``(a, b)`` structs.

    This replaces the band-table SELF-JOIN the LSH operators used before.
    Why it's strictly better here:

    * the band/signature pipeline executes ONCE — it feeds a single groupBy,
      so there is nothing to persist and nothing to leak (the old shape
      persisted the band table because both join sides re-executed it, and
      those pins accumulated across queries in a long-lived session);
    * one shuffle on the bucket key (with map-side partial collect) instead
      of two join-side exchanges plus the join itself;
    * the pair fan-out is identical to the self-join's: O(sum bucket^2),
      which is what LSH banding already bounds (~n/2^band_bits per bucket).

    Skew note for 100 TB: a degenerate bucket (e.g. millions of identical
    docs) materializes its id array on one task, where the self-join form
    would stream — but its quadratic PAIR OUTPUT is the real bound in both
    shapes, and banding with 2^15+ values per band is what keeps buckets
    small. AQE skew handling applies to the groupBy shuffle as usual.

    ``max_bucket`` is the degenerate-bucket guard: buckets larger than the
    cap are DROPPED before the pair explode, bounding output at
    O(buckets x cap^2). (The bucket's id ARRAY still materializes once in
    the aggregate — linear, ~8 bytes/id, fine even for a pathological
    10M-id bucket; it is the quadratic explode the cap prevents.)
    Contract (see ``MAX_BUCKET``): exact-duplicate mass must be collapsed by
    ``collapse_exact_reps``/``exact_dedup`` FIRST — an over-cap bucket on a
    collapsed corpus means near-identical mass where pair-level resolution
    carries no information. The size filter rides the same aggregate that
    builds the bucket (no extra pass); None = unbounded.
    """
    sorted_items = F.array_sort(F.collect_list(item_col))
    buckets = (bands.groupBy(*bucket_cols)
               .agg(sorted_items.alias("items"))
               .filter(F.size("items") >= 2))
    if max_bucket is not None:
        buckets = buckets.filter(F.size("items") <= max_bucket)
    pair_arr = F.flatten(F.transform(
        F.col("items"),
        lambda x, i: F.transform(
            F.slice(F.col("items"), i + F.lit(2), F.size(F.col("items"))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    return buckets.select(F.explode(pair_arr).alias("p")).select("p.a", "p.b")


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.5,
                      num_hashes: int = NUM_HASHES,
                      num_bands: int = NUM_BANDS,
                      k: int = SHINGLE_K,
                      collapse_exact: bool = True,
                      max_bucket: int | None = MAX_BUCKET) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via MinHash-LSH candidates
    verified with exact Jaccard >= threshold.

    Duplicate-heavy corpora: with ``collapse_exact`` (the default), exact-
    duplicate texts are collapsed to their min-id representative BEFORE
    signatures (``collapse_exact_reps``), so N byte-identical documents
    contribute one band row instead of an N^2/2 pair explosion; output pairs
    are between representatives (members rejoin via ``exact_dedup``).
    ``max_bucket`` additionally drops degenerate buckets — the safety valve
    for near-identical-but-not-exact mass (see ``MAX_BUCKET``).

    Plan shape at scale: Arrow minhash signatures (narrow) -> band explode ->
    ONE shuffle on (band_idx, band_hash) -> within-bucket pair explode
    (``bucket_pairs``) -> distinct pairs -> join shingle arrays back ->
    per-row Jaccard verify. No cartesian anywhere, and the signature
    pipeline executes exactly once — the earlier shape self-joined the band
    table, which re-executed signatures on both sides unless persisted, and
    that persist leaked pinned blocks into the session (round-2 task #4).
    The verify join pairs a tiny side (candidate pairs) with the corpus-wide
    shingle projection; AQE picks the broadcast side from runtime stats (at
    scale it broadcasts the candidates so corpus shingle arrays never
    shuffle — the second corpus pass is then pure map-side CPU).
    """
    base = collapse_exact_reps(df, id_col, text_col) if collapse_exact else df
    bands = minhash_bands(base, id_col, text_col, num_hashes, num_bands, k)
    cand = (bucket_pairs(bands, ["band_idx", "band_hash"], F.col(id_col),
                         max_bucket=max_bucket)
            .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
            .distinct())
    # melt-join verify: the shingle projection executes ONCE, and ONLY over
    # candidate documents. The earlier two-sided form joined `sh` as both
    # sh_a and sh_b, which re-ran the Arrow shingle stage per side (2 corpus
    # scans just for verify); the r10 melt form ran it once but still over
    # the WHOLE corpus even though only candidate docs' shingles survive
    # the join — at 100 TB verify must tokenize O(candidates), not
    # O(corpus) (guide §4.1: ship only what the function needs).
    #
    # The candidate bound is expressed as ONE dataflow reference to the
    # pair list (r14 batch 10): each pair melts into two (pair, id) rows,
    # a groupBy on the id collects every id's pair list (bounded by the
    # id's bucket degrees — the max_bucket guard caps degeneracy), the
    # corpus inner-joins that broadcast per-id list (pruning non-candidate
    # docs BEFORE the Python boundary), the Arrow shingle projection rides
    # the joined rows, and exploding the pair list back reassembles
    # (sh_a, sh_b) per pair via max_by on the role flag — shuffling only
    # matched shingle arrays. An earlier form bounded the verify with a
    # SECOND reference to the pair list (a candidate-id broadcast
    # semi-join) and localCheckpointed the list so that reference didn't
    # re-run the signature+band+pair pipeline — but an RDD checkpoint is
    # an opaque plan barrier (under AQE it executes the whole subplan even
    # lazily, at DataFrame-BUILD time), so consumers whose final plan
    # prunes the pair list away still paid for it: graph_pagerank_exact's
    # count-shaped action went from ~3 to ~12 process-tree CPU-s. The
    # single-reference melt keeps the plan transparent — Catalyst prunes
    # or keeps the whole pipeline as the consumer's plan requires — and
    # needs no pinned session storage at all.
    melted = cand.select(
        "id_a", "id_b",
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col))
    need = (melted.groupBy(id_col)
            .agg(F.collect_list(F.struct("id_a", "id_b")).alias("_prs")))
    # Broadcast bound (ADVICE r14): `need` holds one row per candidate id
    # with its pair list — each pair contributes one struct to BOTH
    # endpoints' lists, so the payload is <= 2 * |cand| structs, and
    # |cand| is capped by the max_bucket degree guard at
    # num_bands * C(max_bucket, 2) pairs per band bucket. The hint is
    # deliberate: without it a misestimate makes AQE shuffle the corpus
    # TEXT by id (the payload this shape exists to keep in place).
    docs_cand = df.select(F.col(id_col), F.col(text_col)) \
        .join(F.broadcast(need), id_col)
    sh = shingles_pd_df(docs_cand, id_col, text_col, k,
                        extra_cols=["_prs"])
    rows = (sh.select(F.col(id_col), F.col("sh"),
                      F.explode("_prs").alias("_p"))
            .select(F.col("_p.id_a").alias("id_a"),
                    F.col("_p.id_b").alias("id_b"),
                    F.col(id_col), F.col("sh")))
    pairs = (rows
             .groupBy("id_a", "id_b")
             .agg(F.max_by("sh", (F.col(id_col) == F.col("id_a")).cast("int"))
                  .alias("sh_a"),
                  F.max_by("sh", (F.col(id_col) == F.col("id_b")).cast("int"))
                  .alias("sh_b")))
    return (
        pairs
        .select("id_a", "id_b",
                F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def token_hash_col(tok: Column, bits: int = SIMHASH_BITS) -> Column:
    """Token -> ``bits``-bit non-negative BIGINT: the first bits/4 hex chars
    of its md5 parsed as one integer. Parsing ONCE per token (instead of
    re-deriving instr/substr chains per bit) is what keeps the 60 per-bit
    majority votes as trivial shift/mask integer ops. Bit i of the simhash
    is bit i of this value — identical definition in the DuckDB oracle
    (querylib.dedup parses the same hex span)."""
    return F.conv(F.substring(F.md5(tok), 1, bits // 4), 16, 10).cast("long")


def simhash_col(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """bit-majority SimHash over token md5s, as a BIGINT of ``bits`` bits.

    Bit i (i in 0..bits-1) is the majority of bit i across the tokens'
    ``token_hash_col`` values: weight +1 when set, -1 when clear; majority
    >= 0 sets the bit. Pure integer arithmetic -> bit-exact across engines.
    Degenerate inputs: zero tokens -> every empty majority is >= 0 -> all
    bits set; NULL text -> the fold is NULL -> 0.
    """
    toks = tokens_col(text)
    vs = F.transform(toks, lambda t: token_hash_col(t, bits))
    out = F.lit(0).cast("long")

    def bit_vote(i: int):
        # closure factory: Spark inspects lambda arity, so defaults can't be
        # used to capture loop variables
        def fold(acc, v):
            bit = F.shiftright(v, i) % 2
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))
        return fold

    for i in range(bits):
        contrib = F.aggregate(vs, F.lit(0).cast("long"), bit_vote(i))
        out = out + F.when(contrib >= 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
    return out


def simhash_df(df: DataFrame, id_col: str, text_col: str,
               bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash) via explode -> one md5 per token -> per-bit codegen'd
    votes -> sum per doc. Same bits as ``simhash_col`` (same md5, same bit
    order) but whole-stage-codegen'd with map-side partial aggregation —
    the bulk/scale form (array folds run interpreted).

    Docs with zero tokens don't survive the explode; they are re-attached
    with the value simhash_col computes for them: all bits set for an EMPTY
    token array (every bit-majority over zero votes is >= 0), and 0 for a
    NULL text (the fold over a NULL array is NULL, so no when() branch adds
    a bit). Without the NULL branch those docs vanished from the output
    entirely (tokens_col(NULL) is NULL; size(NULL) is not 0).
    """
    base = df.select(F.col(id_col), F.col(text_col))
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    tok = base.select(F.col(id_col),
                      F.explode(tokens_col(F.col(text_col))).alias("t"))
    # one md5 parse per token, then each bit's majority is SUM((v>>i)&1)
    # against COUNT: 2*ones >= n  <=>  (+1/-1 vote sum) >= 0
    wv = tok.select(F.col(id_col), token_hash_col(F.col("t"), bits).alias("v"))
    aggs = [F.count(F.lit(1)).alias("cnt")] + [
        F.sum(F.shiftright(F.col("v"), i) % 2).alias(f"s{i}")
        for i in range(bits)
    ]
    sums = wv.groupBy(id_col).agg(*aggs)
    sig = sum((F.when(F.col(f"s{i}") * 2 >= F.col("cnt"),
                      F.lit(2 ** i)).otherwise(F.lit(0))
               for i in range(bits)), F.lit(0)).cast("long")
    with_sig = sums.select(F.col(id_col), sig.alias("simhash"))
    empty = (df.filter(F.col(text_col).isNotNull()
                       & (F.size(tokens_col(F.col(text_col))) == 0))
             .select(F.col(id_col),
                     F.lit(2 ** bits - 1).cast("long").alias("simhash")))
    null_text = (df.filter(F.col(text_col).isNull())
                 .select(F.col(id_col), F.lit(0).cast("long").alias("simhash")))
    return with_sig.unionByName(empty).unionByName(null_text)


def simhash_pd_df(df: DataFrame, id_col: str, text_col: str,
                  bits: int = SIMHASH_BITS) -> DataFrame:
    """Arrow fast path for ``simhash_df`` — bit-identical signatures.

    One vectorized pass per Arrow batch replaces the token explode + 60-sum
    hash aggregate (the wide aggregate's codegen cost is what made
    dedup_simhash the one bench regression after the 16->60-bit widening):
    tokenize in Python (same regex as ``tokens_col``), one md5 per DISTINCT
    token with its occurrence count, then all 60 bit-majorities as a single
    (counts @ bit-matrix) int64 matmul per document. Exactness: each
    token's code is the same first-15-hex-chars md5 integer
    (``token_hash_col``), bit votes are exact integer counts, and the
    2*ones >= n majority is the same comparison the codegen'd form makes —
    ``tests/test_impl_consistency.py`` pins frame equality on the real
    documents table.

    Degenerate inputs match ``simhash_col``/``simhash_df`` exactly:
    zero-token text -> all bits set (every empty majority is >= 0);
    NULL text -> 0. Same pattern as ``minhash_signatures_pd``.
    """
    from collections import Counter

    shifts = np.arange(bits, dtype=np.int64)
    powers = (np.int64(1) << shifts)

    @pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for ix, t in enumerate(texts):
            if t is None:
                out[ix] = 0
                continue
            counts = Counter(_TOKEN_RE.findall(t.lower()))
            if not counts:
                out[ix] = (1 << bits) - 1
                continue
            toks = list(counts)
            vs = np.empty(len(toks), dtype=np.int64)
            for j, tok in enumerate(toks):
                d = hashlib.md5(tok.encode("utf-8")).hexdigest()  # noqa: S324
                vs[j] = int(d[:bits // 4], 16)
            cnt = np.fromiter(counts.values(), dtype=np.int64, count=len(toks))
            ones = cnt @ ((vs[:, None] >> shifts[None, :]) & 1)
            out[ix] = powers[2 * ones >= cnt.sum()].sum()
        return pd.Series(out)

    base = df.select(F.col(id_col), F.col(text_col))
    # spread hash work across all cores even from a single-file source
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    return base.select(F.col(id_col), _sim(F.col(text_col)).alias("simhash"))


def simhash_bands_df(sigs: DataFrame, id_col: str = "doc_id",
                     sim_col: str = "simhash",
                     band_bits: int = SIMHASH_BAND_BITS,
                     num_bands: int = SIMHASH_BANDS) -> DataFrame:
    """(id, simhash, band_idx, band): one row per band per signature.

    Band b is bits [b*band_bits, (b+1)*band_bits) extracted with shiftright —
    NOT float division: the code is up to 2^60, past float64's 53-bit
    mantissa, so ``floor(x / 2^k)`` would silently corrupt high bands.

    ONE pass over ``sigs``: the per-band rows come from exploding a
    generated (band_idx, band) struct array, not a union of per-band
    selects — the union form re-executed the upstream signature pipeline
    once per band (num_bands extra corpus passes through the Arrow
    signature stage at 100 TB; no exchange reuse dedups union branches).
    """
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            (F.shiftright(F.col(sim_col), band_bits * b)
             % (2 ** band_bits)).alias("band"))
        for b in range(num_bands)])
    return (sigs.select(F.col(id_col), F.col(sim_col),
                        F.explode(band_structs).alias("_b"))
            .select(F.col(id_col), F.col(sim_col),
                    F.col("_b.band").alias("band"),
                    F.col("_b.band_idx").alias("band_idx")))


def simhash_pairs(sigs: DataFrame, id_col: str = "doc_id",
                  sim_col: str = "simhash",
                  max_hamming: int = SIMHASH_BANDS - 1,
                  max_bucket: int | None = MAX_BUCKET) -> DataFrame:
    """(id_a, id_b, hamming) near-dup pairs from simhash signatures.

    Banded bucket grouping for candidates (never O(n^2): one shuffle on
    (band_idx, band) with 2^15 values per band, then within-bucket pair
    explode — ``bucket_pairs``), exact hamming verify via xor + bit_count.
    Pigeonhole: hamming <= num_bands-1 can corrupt at most that many bands,
    so a true pair always shares >= 1 intact band.

    The signature pipeline executes exactly once (single groupBy consumer) —
    the earlier self-join shape re-executed it per join side (measured 8
    re-executions, ~30 s at sf0.01) unless persisted, and that persist
    leaked pinned blocks into long-lived sessions.

    ``max_bucket`` drops degenerate buckets before the pair explode; exact-
    duplicate mass (identical signatures) must be collapsed upstream — see
    ``MAX_BUCKET``/``collapse_exact_reps``.
    """
    bands = simhash_bands_df(sigs, id_col, sim_col)
    item = F.struct(F.col(id_col).alias("id"), F.col(sim_col).alias("sh"))
    cand = (bucket_pairs(bands, ["band_idx", "band"], item,
                         max_bucket=max_bucket)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
            .distinct())
    return (cand.select(
        "id_a", "id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_cols: list[str], threshold: float = 0.3,
                        k: int = SHINGLE_K) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs WITHIN blocks (e.g. same lang +
    source bucket). Blocking keeps the pair count O(sum block^2) instead of
    O(n^2) — at 100 TB you block on cheap keys (lang, domain, length bucket)
    and let AQE handle block skew."""
    # Arrow shingles (identical sets, order-insensitive consumers): the
    # expression form's interpreted lambdas were ~6 s of this operator's
    # 8 s at sf0.1. localCheckpoint (r14, guide §2.4): the projection
    # feeds BOTH self-join sides, and the block-keyed join exchanges hash
    # on differently-aliased keys, so exchange reuse did not stop the
    # Arrow pass running once per side.
    sh = (shingles_pd_df(df, id_col, text_col, k, extra_cols=block_cols)
          .localCheckpoint(eager=True))
    a = sh.select(F.col(id_col).alias("id_a"), *block_cols,
                  F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"),
                  *[F.col(c).alias(f"{c}_b") for c in block_cols],
                  F.col("sh").alias("sh_b"))
    cond = (F.col("id_a") < F.col("id_b"))
    for c in block_cols:
        cond = cond & (F.col(c) == F.col(f"{c}_b"))
    return (
        a.join(b, cond)
        .select("id_a", "id_b",
                F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def build_neardup_index(history: DataFrame, id_col: str, text_col: str,
                        num_hashes: int = NUM_HASHES,
                        num_bands: int = NUM_BANDS,
                        k: int = SHINGLE_K) -> DataFrame:
    """The stored near-dup index: the (id, band_idx, band_hash) table
    ``incremental_neardup`` probes. Built ONCE at ingest and persisted —
    at 100 TB, write it partitioned/bucketed by ``band_idx`` (and
    clustered by band_hash) so each incremental probe prunes to the
    band's files; this function returns the plain DataFrame, the storage
    layout is the writer's choice. Appending a new batch's own bands
    after its probe keeps the index current without any rebuild
    (test_incremental_index_roundtrip exercises the full
    build -> write -> load -> probe cycle)."""
    return minhash_bands(history, id_col, text_col, num_hashes, num_bands, k)


def incremental_neardup(history: DataFrame, new_batch: DataFrame,
                        id_col: str, text_col: str,
                        threshold: float = 0.5,
                        num_hashes: int = NUM_HASHES,
                        num_bands: int = NUM_BANDS,
                        k: int = SHINGLE_K,
                        max_bucket: int | None = MAX_BUCKET,
                        index: DataFrame | None = None) -> DataFrame:
    """Batch-incremental NEAR-dup check: for every new document, its best
    near-duplicate in the historical corpus (if any) — the every-ingest
    form of MinHash-LSH a continuously-fed pipeline runs, where recomputing
    pairs over 100 TB of history per batch is a non-starter.

    Scale shape: the history side's bands are an ingest-time INDEX —
    pass the STORED band table (``build_neardup_index``, persisted at
    ingest) as ``index``; when omitted (testdata has no stored index) the
    bands are recomputed from the history texts, which is the shape to
    avoid at scale. The new batch is tiny — its bands broadcast, so the
    history index streams map-side and nothing history-sized shuffles.
    ``max_bucket`` drops degenerate history band values (the same guard
    as ``bucket_pairs``: over-cap mass means exact-duplicate pileup that
    exact-dedup should have collapsed). Verification joins shingle
    projections per side and takes each new doc's argmax-jaccard match
    (min history id on ties); new docs with no candidate surface with
    ``has_near_dup = false``. ``history`` supplies candidate TEXTS for
    the verify either way (the index carries only band hashes).
    """
    if index is not None:
        hb = index
    else:
        # recomputed-from-text band table (the at-scale anti-shape testdata
        # forces) feeds TWO consumers below — the degenerate-bucket
        # aggregate and the probe join — so materialize it once rather than
        # running the Arrow minhash pass over all of history twice (r14).
        # A STORED index is left as-is: re-scanning a band table twice is
        # cheap, and the checkpoint would only copy it.
        hb = build_neardup_index(
            history, id_col, text_col, num_hashes, num_bands,
            k).localCheckpoint(eager=True)
    # ONE tokenize pass over the new batch serves BOTH its band probe and
    # its verify shingles (r14 batch 12): the signature UDF already builds
    # every document's shingle set to hash it, so the fused projection
    # emits (sh, sig0..15) together and the old separate shingles_pd_df
    # pass over the same rows disappears. Checkpointing it is in-contract:
    # the new batch is ingest-bounded (the history side is what must never
    # materialize), and the cand checkpoint below re-reads it instead of
    # re-running the Python stage.
    nf = (shingle_sig_pd_df(new_batch, id_col, text_col, num_hashes, k)
          .localCheckpoint(eager=True))
    nb = _bands_from_sigs(nf, id_col, num_hashes, num_bands)
    if max_bucket is not None:
        ok = (hb.groupBy("band_idx", "band_hash")
              .agg(F.count(F.lit(1)).alias("_n"))
              .filter(F.col("_n") <= max_bucket)
              .select("band_idx", "band_hash"))
        hb = hb.join(ok, ["band_idx", "band_hash"], "left_semi")
    cand = (hb.select(F.col(id_col).alias("hist_id"), "band_idx", "band_hash")
            .join(F.broadcast(nb.select(F.col(id_col).alias("new_id"),
                                        "band_idx", "band_hash")),
                  ["band_idx", "band_hash"])
            .select("new_id", "hist_id").distinct()
            # materialize the (new-batch-bounded, tiny) candidate list so it
            # can bound the history shingle pass below WITHOUT re-executing
            # the band pipelines — the classic double-execution trap any
            # second reference to `cand` would otherwise spring
            .localCheckpoint(eager=True))
    sh_new = nf.select(F.col(id_col), F.col("sh"))
    # shingle ONLY candidate history docs: the verify stage must never run
    # a second corpus-wide Arrow pass over 100 TB of history when the
    # candidate set is new-batch-bounded
    hist_cand = history.join(
        F.broadcast(cand.select(F.col("hist_id").alias(id_col)).distinct()),
        id_col, "left_semi")
    sh_hist = shingles_pd_df(hist_cand, id_col, text_col, k)
    scored = (cand
              .join(F.broadcast(sh_new.select(F.col(id_col).alias("new_id"),
                                              F.col("sh").alias("sh_n"))),
                    "new_id")
              .join(sh_hist.select(F.col(id_col).alias("hist_id"),
                                   F.col("sh").alias("sh_h")), "hist_id")
              .select("new_id", "hist_id",
                      F.round(jaccard_col(F.col("sh_n"), F.col("sh_h")), 4)
                      .alias("jaccard"))
              .filter(F.col("jaccard") >= threshold))
    from pyspark.sql.window import Window
    w = Window.partitionBy("new_id").orderBy(F.col("jaccard").desc(),
                                             F.col("hist_id"))
    best = (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("new_id", F.col("hist_id").alias("best_match_id"),
                    F.col("jaccard").alias("best_jaccard")))
    return (new_batch.select(F.col(id_col))
            .join(best, F.col(id_col) == F.col("new_id"), "left")
            .select(id_col,
                    F.col("best_match_id").isNotNull().alias("has_near_dup"),
                    "best_match_id", "best_jaccard"))
