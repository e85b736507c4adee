"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

North-star extensions (SURVEY.md §7 Phase 5) built for 100 TB:

* **exact**: hash-groupBy on content (or md5 fingerprint) — one shuffle on
  the dedup key, map-side partial agg; never collects to the driver.
* **MinHash-LSH**: shingles -> per-hash min signature -> banded bucket hash ->
  self-join on (band, bucket) for candidates -> exact Jaccard verify. The
  candidate join is an equi-join on the band hash, so the shuffle volume is
  O(docs x bands), NOT O(docs^2); skewed buckets are AQE-split.
* **SimHash**: 16-bit bit-majority signature from token md5s; near-dup pairs
  join on the signature (or banded halves for 1-2 bit tolerance).
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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingles_col, tokens_col

# MinHash configuration shared by the Spark implementation and the generated
# DuckDB oracle SQL (querylib.dedup builds the SQL from these constants).
NUM_HASHES = 16
NUM_BANDS = 4          # 4 bands x 4 rows: catches ~Jaccard >= ~0.6 candidates
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
SHINGLE_K = 3

SIMHASH_BITS = 16      # 4 md5 hex chars x 4 bits


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


def minhash_bands(df: DataFrame, id_col: str, text_col: str,
                  num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
                  k: int = SHINGLE_K) -> DataFrame:
    """(id, band_idx, band_hash): one row per band per document."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, k)
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


def jaccard_col(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.5,
                      num_hashes: int = NUM_HASHES,
                      num_bands: int = NUM_BANDS,
                      k: int = SHINGLE_K) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via MinHash-LSH candidates
    verified with exact Jaccard >= threshold.

    Plan shape at scale: bands explode (narrow) -> shuffle on band_hash ->
    pair generation within buckets -> distinct pairs -> join shingle arrays
    back -> per-row Jaccard verify. No cartesian anywhere. The verify joins
    pair a tiny side (candidate pairs) with the corpus-wide shingle
    projection; AQE picks the broadcast side from runtime stats (locally
    the corpus side is small enough to broadcast; at scale it flips to
    broadcasting the candidates so corpus shingle arrays never shuffle —
    the second corpus pass is then pure map-side CPU).

    Measured alternative (rejected): semi-joining the corpus down to
    candidate ids before the shingle projection re-executes the whole
    candidate pipeline once per verify side unless the candidates are
    persisted, and persisting splits the single lazy DAG into extra jobs —
    min-of-5 at sf0.1: 3.5 s lazy form, 4.4 s semi-join form, 8.6 s
    persisted+broadcast form. Worth revisiting only for corpora where
    tokenize+shingle dominates the scan itself.
    """
    bands = minhash_bands(df, id_col, text_col, num_hashes, num_bands, k)
    b1 = bands.alias("b1")
    b2 = bands.alias("b2")
    cand = (
        b1.join(b2, (F.col("b1.band_idx") == F.col("b2.band_idx"))
                & (F.col("b1.band_hash") == F.col("b2.band_hash"))
                & (F.col(f"b1.{id_col}") < F.col(f"b2.{id_col}")))
        .select(F.col(f"b1.{id_col}").alias("id_a"),
                F.col(f"b2.{id_col}").alias("id_b"))
        .distinct()
    )
    sh = df.select(F.col(id_col), shingles_col(F.col(text_col), k).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b",
                F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _hex_digit_val(ch: Column) -> Column:
    """hex char -> 0..15, portable (instr on the hex alphabet)."""
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def simhash_col(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """bit-majority SimHash over token md5s, as a BIGINT of ``bits`` bits.

    Bit i (i in 0..bits-1) comes from hex char i//4, bit i%4 of each token's
    md5. Weight +1 when set, -1 when clear; majority >= 0 sets the bit.
    Pure integer arithmetic -> bit-exact across engines.
    """
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: F.md5(t))
    out = F.lit(0).cast("long")

    def bit_vote(hex_pos: int, shift: int):
        # closure factory: Spark inspects lambda arity, so defaults can't be
        # used to capture loop variables
        def fold(acc, h):
            bit = F.floor(_hex_digit_val(F.substring(h, hex_pos, 1)) / (2 ** shift)) % 2
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))
        return fold

    for i in range(bits):
        hex_pos = i // 4 + 1          # 1-based substr position
        shift = 3 - (i % 4)           # bit 0 of i%4 = MSB of the nibble
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(hex_pos, shift))
        out = out + F.when(contrib >= 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
    return out


def simhash_df(df: DataFrame, id_col: str, text_col: str,
               bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash) via explode -> one md5 per token -> 16 codegen'd bit
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
    h = F.md5(F.col("t"))
    votes = []
    for i in range(bits):
        hex_pos = i // 4 + 1
        shift = 3 - (i % 4)
        bit = F.floor(_hex_digit_val(F.substring(h, hex_pos, 1)) / (2 ** shift)) % 2
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{i}"))
    sums = tok.groupBy(id_col).agg(*votes)
    sig = sum((F.when(F.col(f"v{i}") >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
               for i in range(bits)), F.lit(0)).cast("long")
    with_sig = sums.select(F.col(id_col), sig.alias("simhash"))
    empty = (df.filter(F.col(text_col).isNotNull()
                       & (F.size(tokens_col(F.col(text_col))) == 0))
             .select(F.col(id_col),
                     F.lit(2 ** bits - 1).cast("long").alias("simhash")))
    null_text = (df.filter(F.col(text_col).isNull())
                 .select(F.col(id_col), F.lit(0).cast("long").alias("simhash")))
    return with_sig.unionByName(empty).unionByName(null_text)


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_cols: list[str], threshold: float = 0.3,
                        k: int = SHINGLE_K) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs WITHIN blocks (e.g. same lang +
    source bucket). Blocking keeps the pair count O(sum block^2) instead of
    O(n^2) — at 100 TB you block on cheap keys (lang, domain, length bucket)
    and let AQE handle block skew."""
    sh = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        shingles_col(F.col(text_col), k).alias("sh"))
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
