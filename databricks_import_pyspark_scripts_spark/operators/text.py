r"""Text-analysis column builders: token counts, quality score, language-ID
heuristic, document fingerprints.

North-star extension operators (not in the reference, SURVEY.md §7 Phase 5)
for the LLM-pre-training-pipeline use case. Everything here is a pure builtin
column expression (regexp / higher-order functions / md5) — per-row, zero
shuffle, whole-stage-codegen'd, so at 100 TB these run at parquet scan speed.

Each builder has an exact DuckDB-SQL twin in querylib (the correctness gate);
the arithmetic is written so both engines produce bit-identical results
(integer counts, single-expression double math, md5 for hashing — md5 is the
one hash both engines implement identically).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword lang-ID heuristic.
# Deliberately short — the heuristic is a deterministic capability exemplar.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "a", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu", "mit"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
}

TOKEN_PATTERN = "[a-z0-9]+"  # BPE-ish: lowercase alnum runs


def words_col(text: Column) -> Column:
    """Whitespace-split word array."""
    return F.split(F.trim(text), r"\s+")


def word_count_col(text: Column) -> Column:
    return F.size(words_col(text))


def tokens_col(text: Column) -> Column:
    """Lowercased alnum-run tokens (regexp_extract_all)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def punct_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[^a-zA-Z0-9\s]"), 0))


def quality_score_col(text: Column) -> Column:
    """Heuristic quality in [0,1]: 0.4*length-saturation + 0.3*(1 - punct
    ratio) + 0.3*word-count saturation. Mirrors the standard corpus-filter
    shape (length / symbol ratio / word count)."""
    n = F.length(text)
    length_sat = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_ratio = F.least(
        punct_count_col(text) * F.lit(1.0) / F.greatest(n, F.lit(1)), F.lit(1.0))
    word_sat = F.least(word_count_col(text) / F.lit(100.0), F.lit(1.0))
    return (F.lit(0.4) * length_sat
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
            + F.lit(0.3) * word_sat)


def stopword_hits_col(text: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens_col(text), lambda t: F.array_contains(stops, t)))


def lang_id_col(text: Column) -> Column:
    """Argmax-stopword-hits language guess; 'und' (undetermined) when no
    language scores a hit. Ties break alphabetically (deterministic)."""
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # alphabetical scan with strict > : the alphabetically-first max wins ties
    for lang in sorted(LANG_STOPWORDS):
        hits = stopword_hits_col(text, lang)
        best_lang = F.when(hits > best_hits, F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(hits, best_hits)
    return best_lang


def fingerprint_col(text: Column) -> Column:
    """Exact-content fingerprint: md5 of the token-normalized text (lowercase
    alnum tokens joined by single spaces), so whitespace/punctuation noise
    doesn't change the fingerprint. md5 is implemented identically in Spark
    and DuckDB — portable across the oracle boundary."""
    return F.md5(F.array_join(tokens_col(text), " "))


def shingles_col(text: Column, k: int = 3) -> Column:
    """Array of k-token shingle strings (distinct), the MinHash input unit."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.array_join(toks, " "))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))))


def split_bucket_col(id_col: Column, num_buckets: int = 100) -> Column:
    """Deterministic split bucket in [0, num_buckets): md5 of the id's
    string form, first 8 hex digits as an integer, mod buckets.

    The reproducible train/val/holdout split for a training-data pipeline:
    a pure column expression (no rand(), no state), stable across runs,
    engines, partitionings and cluster sizes — md5 is the hash Spark and
    DuckDB share, so split membership is oracle-checkable. At 100 TB the
    bucket is computed at ingest and stored; downstream jobs filter on it
    and the predicate pushes down to the scan."""
    h = F.md5(id_col.cast("string"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(num_buckets)).cast("int")


def pack_sequences(df, id_col: str, shard_col: str, tokens_col_name: str,
                   budget: int):
    """Assign each document a ``pack_id``: consecutive docs (by ``id_col``
    within a ``shard_col`` shard) bin into fixed-token-budget packs by
    cumulative token offset — pack = floor(tokens_before_this_doc / budget).

    The sequence-packing step of an LLM training-data pipeline (group
    documents into ~context-length batches). This is the *streaming* pack:
    a doc whose tokens straddle a budget boundary belongs to the pack its
    FIRST token falls in (training pipelines truncate/continue across the
    boundary), which is what makes the assignment a pure prefix-sum —
    deterministic, order-stable, and expressible in any engine with window
    functions, unlike greedy first-fit bin packing (which needs a running
    reset no SQL window can express).

    Scale: ONE shuffle, on the shard key. Each shard's prefix sum is an
    independent ordered window — shards are the parallelism unit (use
    enough buckets that a shard's docs fit a task; the md5 id-hash bucket
    from ``split_bucket_col`` spreads uniformly). No global ordering, no
    driver involvement.
    """
    from pyspark.sql.window import Window

    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(tokens_col_name).over(w),
                            F.lit(0).cast("long"))
    # float floor is exact here: cumulative token counts are far below 2^53
    return df.withColumn(
        "pack_id", F.floor(cum_before / F.lit(budget)).cast("long"))


def dup_line_frac_col(text: Column) -> Column:
    """Fraction of duplicated lines: 1 - distinct_lines/total_lines. A
    per-row expression (no shuffle) — the classic boilerplate/repetition
    signal from corpus-quality filtering (high values = templated or
    machine-generated text)."""
    lines = F.split(text, "\n")
    n = F.size(lines)
    return (F.lit(1.0)
            - F.size(F.array_distinct(lines)) / F.greatest(n, F.lit(1)))


def top_bigram_stats(df, id_col: str, text_col: str):
    """(id, top_n, total): occurrence count of the most frequent token
    bigram and the total bigram count per document — the numerator and
    denominator of the top-2-gram-fraction repetition signal.

    Codegen-friendly shape: posexplode tokens -> per-doc window lead(1) to
    form bigrams -> two hash aggregations. One shuffle on the doc id (the
    window and both groupBys share the partitioning; docs with < 2 tokens
    drop out — callers re-attach them with fraction 0). Interpreted
    higher-order lambdas are deliberately avoided in this corpus-wide path.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = (toks
               .withColumn("nxt", F.lead("tok").over(w))
               .filter(F.col("nxt").isNotNull())
               .select(F.col(id_col),
                       F.concat_ws(" ", "tok", "nxt").alias("bg")))
    counts = bigrams.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy(id_col).agg(
        F.max("n").alias("top_n"),
        F.sum("n").alias("total"))


def bigrams_df(df, id_col: str, text_col: str):
    """(id, bg): one row per consecutive token bigram per document.

    Codegen shape shared with ``top_bigram_stats``: posexplode tokens ->
    per-doc window lead(1) -> concat. One shuffle on the doc id; docs with
    fewer than 2 tokens produce no rows (callers left-join them back).
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    return (toks
            .withColumn("nxt", F.lead("tok").over(w))
            .filter(F.col("nxt").isNotNull())
            .select(F.col(id_col), F.concat_ws(" ", "tok", "nxt").alias("bg")))


BOILER_NGRAM = 3      # n-gram width for boilerplate detection
BOILER_MIN_DF_PCT = 1  # an n-gram in >= this PERCENT of docs is corpus-frequent
BOILER_FLAG_FRAC = 0.2  # flag a doc when this fraction of its n-grams is frequent


def boilerplate_ngram_stats(df, id_col: str, text_col: str,
                            n: int = BOILER_NGRAM,
                            min_df_pct: int = BOILER_MIN_DF_PCT,
                            flag_frac: float = BOILER_FLAG_FRAC):
    """(id, n_ngrams, n_boiler, boiler_frac, is_boilerplate): how much of a
    document is made of corpus-frequent n-grams — the template/boilerplate
    detector (navigation chrome, license headers, SEO spam) that per-doc
    repetition rules (``dup_line_frac_col``) cannot see because the
    repetition lives ACROSS documents.

    The frequency threshold is RELATIVE — an n-gram is corpus-frequent
    when it appears in at least ``min_df_pct`` percent of documents
    (integer-exact compare ``cnt * 100 >= pct * n_docs``, no float
    boundary) — because an absolute document count cannot survive a
    corpus-size change: a fixed min_df=5 classified 98% of every
    document's n-grams as "frequent" on a 10x denser corpus and emptied
    the downstream pipeline.

    Shape: distinct per-doc n-grams (``shingles_col`` — distinct, so the
    per-n-gram count below is a document frequency) -> explode -> one
    shuffle on the n-gram for the DF count (plus a scan-only COUNT(*) of
    the corpus for the relative threshold) -> the frequent subset joins
    back against the exploded view -> one shuffle on the doc id to
    re-aggregate. The frequent set is the heavy-hitter tail (151 of 16k
    distinct 3-grams at sf0.01), so AQE broadcasts it and the corpus side
    of the membership join never shuffles; at 100 TB, if the frequent set
    outgrows broadcast, the same statistic runs off a count-min-sketch
    (``querylib.advanced.approx_heavy_hitters`` is that machinery) at the
    cost of overcounting rare n-grams.

    ``boiler_frac`` divides two exact int64s; the quotient is identical
    IEEE math in any engine, and 4-dp round boundaries (odd multiples of
    1e-5) are not representable as dyadic rationals, so the round cannot
    split engines.
    """
    # Arrow shingles, not the expression form: this projection executes
    # twice (the DF-count branch and the membership join below), and the
    # nested transform/slice lambdas run interpreted — the same 2.3 s/pass
    # cost the LSH verify stage eliminated (operators.dedup.shingles_pd_df,
    # identical sets, pinned by test_impl_consistency).
    from .dedup import shingles_pd_df
    sh = (shingles_pd_df(df, id_col, text_col, n)
          .select(F.col(id_col), F.explode("sh").alias("ng")))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    freq = (sh.groupBy("ng").agg(F.count(F.lit(1)).alias("_df"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("_df") * 100 >= min_df_pct * F.col("_n_docs"))
            .select("ng", F.lit(1).alias("_hit")))
    joined = sh.join(freq, "ng", "left")
    frac = F.col("n_boiler") * 1.0 / F.col("n_ngrams")
    return (joined.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_ngrams"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_boiler"))
            .select(id_col, "n_ngrams", "n_boiler",
                    F.round(frac, 4).alias("boiler_frac"),
                    (frac >= flag_frac).alias("is_boilerplate")))


MIX_BUCKETS = 10000  # md5 hash-bucket resolution for mixture sampling


def mixture_budget_keep(df, id_col: str, source_col: str, ntok_col: str,
                        weight_col, budget_num: int = 2, budget_den: int = 5,
                        buckets: int = MIX_BUCKETS):
    """Token-budget mixture sampling: keep a deterministic subset of each
    source so the kept corpus approaches ``budget = total_tokens *
    budget_num / budget_den`` tokens split across sources by integer
    percentage ``weight_col`` (a Column, e.g. a CASE over the source name;
    weights sum to 100).

    Per-source keep rate is ``budget * w / (100 * src_tokens)`` (capped at
    1 implicitly — the bucket can never exceed its range), applied through
    the md5 id-hash bucket every sampling operator here uses. The keep
    decision compares CROSS-MULTIPLIED int64s — ``bucket * src_tokens <
    budget * w * (buckets / 100)`` — so there is no floating-point rate and
    membership is bit-stable across engines (both factors stay < 1e17 for
    petabyte-scale token counts, inside int64).

    Shape: one groupBy shuffle for per-source token totals (tiny result,
    broadcast back), one 1-row total-tokens aggregate cross-joined in, then
    a pure per-row predicate — at 100 TB the expensive pass is the token
    count, which a real pipeline has stored at ingest anyway.

    ``buckets`` must be a multiple of 100: the predicate folds the percent
    denominator into ``buckets // 100`` to keep both int64 factors under
    overflow headroom at petabyte token counts, and that folding is only
    exact when 100 divides buckets (buckets=50 would silently keep nothing,
    buckets=150 would under-keep by a third).
    """
    if buckets % 100 != 0:
        raise ValueError(
            f"buckets must be a multiple of 100 (got {buckets}): the keep "
            f"predicate folds the integer-percent denominator into "
            f"buckets // 100")
    per_src = df.groupBy(source_col).agg(F.sum(ntok_col).alias("_src_tok"))
    # budget derives from per_src (sum of per-source sums == total), NOT
    # from a second aggregate over df: an expensive upstream feeding df
    # would otherwise execute once per reference
    budget = per_src.agg(
        ((F.sum("_src_tok") * budget_num
          - (F.sum("_src_tok") * budget_num) % budget_den) / budget_den)
        .cast("long").alias("_budget"))
    bucket = split_bucket_col(F.col(id_col), buckets)
    return (df.join(F.broadcast(per_src), source_col)
            .crossJoin(F.broadcast(budget))
            .withColumn("_bucket", bucket.cast("long"))
            .filter(F.col("_bucket") * F.col("_src_tok")
                    < F.col("_budget") * weight_col * F.lit(buckets // 100)))


def ngram_total_col(text: Column, n: int = BOILER_NGRAM) -> Column:
    """Total (NON-distinct) n-gram count: max(token_count - n + 1, 1) —
    matching shingles_col's short-text convention of one whole-text
    shingle."""
    return F.greatest(token_count_col(text) - F.lit(n - 1), F.lit(1)).cast("long")


def distinct_shingle_count_pd_col(text: Column, n: int = BOILER_NGRAM) -> Column:
    """Arrow column expression for ``size(shingles_col(text, n))``: the
    same int64 count over the same distinct set (``_py_shingles`` is the
    shared Python twin), but one Python pass per Arrow batch instead of
    the expression form's interpreted transform/slice lambdas (~5x on a
    corpus-wide projection). Stays a COLUMN, so consumers keep the
    zero-shuffle per-row scan shape.

    NULL-text convention (deliberate, differs from the expression form):
    0. The expression form returns size([null]) == 1 — a Catalyst
    null-propagation artifact (`array(array_join(null))`), not a semantic
    choice — and the DuckDB oracle returns NULL; a null text genuinely has
    ZERO shingles. No gate corpus contains null texts (corpus-prep quality
    gates drop them before these operators in any real pipeline);
    test_null_text_conventions pins all three behaviors so the divergence
    stays visible instead of latent."""
    from pyspark.sql.pandas.functions import pandas_udf

    from .dedup import _py_shingles

    @pandas_udf("long")
    def _cnt(texts):
        import pandas as pd

        return pd.Series([
            0 if t is None else len(_py_shingles(t, n)) for t in texts])

    return _cnt(text)


def self_repetition_stats(df, id_col: str, text_col: str,
                          n: int = BOILER_NGRAM):
    """(id, n_ngrams_total, n_ngrams_distinct, self_rep_frac): the
    WITHIN-document repetition signal (looping generations, copy-paste
    spam, template chrome repeated inside one page) — 1 minus the
    distinct/total n-gram ratio. Complements ``boilerplate_ngram_stats``
    (ACROSS-document repetition) and the Gopher dup-line/top-bigram rules
    (line- and bigram-granular): per-row columns (the distinct count via
    the Arrow batch expression, see ``distinct_shingle_count_pd_col``),
    zero shuffle, scan-speed at 100 TB.

    Exactness: both counts are int64; the fraction divides two exact ints
    (identical IEEE result in any engine; 4-dp round boundaries are not
    dyadic, so the round cannot split engines).
    """
    total = ngram_total_col(F.col(text_col), n)
    distinct = distinct_shingle_count_pd_col(F.col(text_col), n)
    frac = F.lit(1.0) - distinct * 1.0 / total
    return df.select(
        F.col(id_col),
        total.alias("n_ngrams_total"),
        distinct.alias("n_ngrams_distinct"),
        F.round(frac, 4).alias("self_rep_frac"))


def stratified_sample_exact(df, strata_cols: list[str], keep_num: int,
                            keep_den: int, id_col: str):
    """EXACT stratified sampling: within every stratum (the distinct
    ``strata_cols`` tuple), keep precisely ``floor(n * keep_num/keep_den)``
    rows — the floor-quota guarantee a per-row hash threshold
    (``split_bucket_col``) only hits in expectation. Row selection is the
    md5 rank of the id within the stratum: deterministic, engine-portable,
    stable across partitionings.

    The keep decision is the CROSS-MULTIPLIED integer comparison
    ``rank * keep_den <= n * keep_num`` — ``floor(0.2 * n)`` via float
    multiplication loses quota rows on exact multiples (0.2*15 =
    2.999...96 floors to 2), and the integer form cannot.

    Scale shape: ONE shuffle on the strata columns serves both the
    per-stratum count and the rank (same window partitioning); the cost
    over the hash-threshold form is the per-stratum SORT of md5 ranks.
    That is the price of exactness — use this for budget-critical strata
    (eval/holdout carve-outs, per-language quotas), and the O(1)-per-row
    ``split_bucket_col`` where binomial jitter is acceptable. Skewed
    stratum sizes are the usual window straggler story; for one giant
    stratum, pre-filter with a loose md5-bucket threshold, then exact-rank
    only the survivors.
    """
    from pyspark.sql.window import Window

    if keep_num < 0 or keep_den <= 0:
        raise ValueError(f"bad keep fraction {keep_num}/{keep_den}")
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    wn = Window.partitionBy(*strata_cols)
    return (df
            .withColumn("_rn", F.row_number().over(w).cast("long"))
            .withColumn("_n", F.count(F.lit(1)).over(wn).cast("long"))
            .filter(F.col("_rn") * keep_den <= F.col("_n") * keep_num)
            .drop("_rn", "_n"))


def global_shuffle_shards(df, id_col: str, n_shards: int,
                          seed: str = "42"):
    """Deterministic global corpus shuffle + round-robin shard assignment:
    the LAST step of a training-data pipeline, between corpus prep and the
    training loader. Every row gets ``global_index`` (its position in the
    md5(seed:id)-shuffled total order), ``shard = global_index % n_shards``
    and ``pos_in_shard = global_index div n_shards``. Dealing the shuffled
    order round-robin makes shard sizes even to ±1 row and every shard an
    unbiased interleave of the whole corpus — the two properties data
    loaders assume when they stripe shards across workers.

    Scale shape: the naive ``row_number() OVER (ORDER BY hash)`` plans as
    an Exchange SinglePartition + one-task sort — the canonical window
    scale-killer. This computes the SAME total order distributively, the
    two-pass zipWithIndex recipe expressed in DataFrame ops:

    1. counting pass — rows reduce map-side to 256 (bucket, count) rows
       (bucket = first md5 hex byte), so the only data crossing the wire
       is the tiny partial-agg output; cumulative offsets over those 256
       rows are a trivially small single-partition window;
    2. rank pass — a window partitioned BY BUCKET (all cores sort their
       own hash range) plus a broadcast join of the offsets, and
       ``global_index = bucket_offset + rank_within_bucket - 1``.

    Because the bucket IS the hash prefix, (bucket, hash) order equals
    hash order, so the composed index is bit-identical to the one-task
    sort's. Two corpus scans total; the heavy one shuffles on 256
    uniformly-loaded md5 buckets (hash output ≈ uniform, so no skew by
    construction). At 100 TB: bucket count is the sort parallelism — widen
    the prefix to 4 hex chars (65536 buckets) once per-bucket data
    outgrows executor memory; the recipe is unchanged.

    Seed folds into the hash input (``md5(seed || ':' || id)``), so a new
    seed is a completely fresh permutation — epoch reshuffles are a column
    swap, not a new algorithm.
    """
    from pyspark.sql.window import Window

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive (got {n_shards})")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    bkt = F.substring(h, 1, 2)
    counts = (df.select(bkt.alias("_bkt"))
              .groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt")))
    offs = (counts
            .withColumn(
                "_off",
                F.coalesce(
                    F.sum("_cnt").over(
                        Window.orderBy("_bkt")
                        .rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0)).cast("long"))
            .select("_bkt", "_off"))
    wb = Window.partitionBy("_bkt").orderBy(F.col("_h").asc(),
                                            F.col(id_col).asc())
    gidx = F.col("_off") + F.col("_rn") - 1
    return (df
            .withColumn("_h", h)
            .withColumn("_bkt", bkt)
            .withColumn("_rn", F.row_number().over(wb).cast("long"))
            .join(F.broadcast(offs), "_bkt")
            .withColumn("global_index", gidx)
            .withColumn("shard",
                        (F.col("global_index") % n_shards).cast("int"))
            .withColumn("pos_in_shard",
                        F.expr(f"global_index div {int(n_shards)}"))
            .drop("_h", "_bkt", "_rn", "_off"))


# ---------------------------------------------------------------------------
# DSIR data selection (Xie et al. 2023, arXiv:2302.03169)

DSIR_BUCKETS = 512


def dsir_bucket_col(feature: Column, n_buckets: int = DSIR_BUCKETS) -> Column:
    """Hashed-feature bucket in [0, n_buckets): md5 first-8-hex as int,
    the same cross-engine hash every split/sample operator here uses."""
    return (F.conv(F.substring(F.md5(feature), 1, 8), 16, 10)
            .cast("long") % F.lit(n_buckets)).cast("int")


def dsir_logweights(df, id_col: str, text_col: str, target_col: str,
                    n_buckets: int = DSIR_BUCKETS, ngram: int = 2):
    """Data Selection via Importance Resampling (DSIR): score every raw
    document by how target-like its hashed n-gram profile is.

    Features are md5-bucketed word-``ngram`` shingles (distinct per doc
    — the binary-feature variant); ``p`` is the add-1-smoothed bucket
    distribution over TARGET docs (``target_col`` true), ``q`` over the
    rest; a doc's score is ``sum_b log(p[b]/q[b])`` over its features.
    Returns (id, dsir_logw) — rank/threshold downstream for the actual
    resample.

    Scale shape: explode -> ONE grouped count over (bucket, is_target)
    (map-side combine, B-bounded result), the B-row log-ratio table
    broadcast back onto the exploded features, one per-doc sum — the
    corpus shuffles once on the bucket id and once on the doc id;
    nothing is quadratic, no vocabulary is ever materialized (hashing
    IS the point of DSIR: B stays driver-sized at any corpus size).

    The (id, tgt, bucket) feature projection has TWO consumers (the
    bucket-distribution count and the per-doc score join), so it is
    computed ONCE — Arrow-batched shingles (``shingles_pd_df``, the same
    set-identical fast path the containment/LSH family uses instead of
    the interpreted transform/slice lambda chain) with the md5 bucket
    still a codegen'd JVM expression, then localCheckpointed so the
    second consumer never replays the tokenize+shingle+hash pipeline.
    The checkpoint holds only (id, bool, int) rows — O(distinct features)
    of a few bytes each, executor-storage-scale at any corpus size."""
    from .dedup import shingles_pd_df  # local: dedup imports this module

    sh = shingles_pd_df(
        df.select(F.col(id_col),
                  F.col(target_col).cast("boolean").alias("__tgt"),
                  F.col(text_col)),
        id_col, text_col, ngram, extra_cols=["__tgt"])
    feats = (sh.select(F.col(id_col), F.col("__tgt"),
                       F.explode("sh").alias("__f"))
             .withColumn("__b", dsir_bucket_col(F.col("__f"), n_buckets))
             .drop("__f")
             .localCheckpoint(eager=True))
    cnt = (feats.groupBy("__b")
           .agg(F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("pc"),
                F.sum(F.when(~F.col("__tgt"), 1).otherwise(0)).alias("qc")))
    tot = cnt.agg(F.sum("pc").alias("pt"), F.sum("qc").alias("qt"))
    ratio = (cnt.crossJoin(F.broadcast(tot))
             .select("__b",
                     (F.log((F.col("pc") + 1.0)
                            / (F.col("pt") + F.lit(float(n_buckets))))
                      - F.log((F.col("qc") + 1.0)
                              / (F.col("qt") + F.lit(float(n_buckets)))))
                     .alias("lr")))
    return (feats.join(F.broadcast(ratio), "__b")
            .groupBy(id_col)
            .agg(F.round(F.sum("lr"), 4).alias("dsir_logw")))
