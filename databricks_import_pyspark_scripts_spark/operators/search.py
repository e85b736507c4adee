"""Lexical search over the document corpus: inverted-index build and BM25
ranking, plus duplicated-passage detection (the fixed-window approximation of
exact-substring dedup) and shingle-containment scoring.

The reference engine delegates all query logic to SQL and has no search tier
(`unload_databricks_data_to_s3.py` is an unload job); this module is part of
the LLM-training-data extension surface alongside operators/dedup.py and
operators/similarity.py.

Determinism model (what makes BM25 oracle-checkable across engines):

* **ln-free BM25.** Classic BM25 idf uses ``ln((N-df+0.5)/(df+0.5)+1)``, but
  ``ln`` is not required to be correctly rounded by IEEE 754, so Spark (JVM
  libm) and DuckDB (C libm) may disagree in the last ulp. We use the
  *rational* idf ``(N - df + 0.5) / (df + 0.5)`` instead — built only from
  ``+ - * /``, which ARE correctly rounded, so both engines produce
  bit-identical doubles for the same expression tree.
* **Fixed-point contributions.** Per-(term, doc) contributions are quantized
  to 1e-6 fixed point (BIGINT) *before* the per-query sum, so the sum is
  exact integer arithmetic and immune to float summation-order differences
  between engines.
* **Single-source formula.** The contribution expression is one SQL string
  (``BM25_CONTRIB_SQL``) evaluated by Spark via ``F.expr`` and pasted
  verbatim into the DuckDB oracle — the two engines cannot drift.

Scale notes (100 TB):
* The inverted index is one shuffle (groupBy doc,term) over the token
  explode; document frequency is a second map-side-combinable aggregate on
  the postings — both partial-agg friendly, no row explosion beyond tokens.
* Query terms and the (n_docs, avgdl) scalar row are tiny and broadcast;
  the postings scan streams once per search batch.
* Top-k per query uses a per-partition window after the score aggregate;
  for huge query batches switch to the bucketed top-k pattern in
  operators/similarity.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

BM25_K1 = 1.2
BM25_B = 0.75
BM25_FIXED = 1_000_000  # 1e-6 fixed-point quantum for contributions
BM25_TOPK = 5

# the single-source per-(term,doc) contribution: evaluated by Spark via
# F.expr and embedded verbatim in the DuckDB oracle. Operand columns:
# n_docs, df, tf, dl (BIGINT) and avgdl (DOUBLE). Only correctly-rounded
# IEEE ops (+ - * /) so both engines agree bitwise; ROUND->BIGINT quantizes
# before any multi-term summation.
BM25_CONTRIB_SQL = (
    f"CAST(ROUND(((n_docs - df + 0.5) / (df + 0.5)) * "
    f"((tf * ({BM25_K1} + 1.0)) / "
    f"(tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (dl / avgdl)))) "
    f"* {BM25_FIXED}.0) AS BIGINT)")


def term_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted-index postings: (id, term, tf). One explode + one
    map-side-combinable aggregate."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def doc_lengths(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl): token count per document."""
    return docs.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("dl"))


def top_terms_as_queries(postings: DataFrame, n_terms: int,
                         terms_per_query: int) -> DataFrame:
    """Derive a deterministic query workload from the corpus itself: the
    ``n_terms`` most frequent terms (count desc, term asc — total order),
    chunked into consecutive groups of ``terms_per_query``; qid is the
    chunk index. Returns (qid, term).

    The global top-n is an aggregate + single-partition window over n rows,
    fine at any corpus size (the aggregate is partial; only n_terms rows
    reach the window)."""
    from pyspark.sql import Window

    totals = postings.groupBy("term").agg(F.sum("tf").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = totals.select(
        "term", F.row_number().over(w).alias("rk")).filter(
        F.col("rk") <= n_terms)
    # FLOOR, not a bare cast: Spark's double->long cast truncates but
    # DuckDB's rounds, so the oracle twin must (and does) spell FLOOR too
    return ranked.select(
        F.floor((F.col("rk") - 1) / terms_per_query).cast("long").alias("qid"),
        "term")


class Bm25Index:
    """Handle to a materialized BM25 index: iterable as the
    ``(postings, doc_lengths)`` pair every consumer expects, plus an
    explicit storage lifetime.

    localCheckpoint pins MEMORY_AND_DISK blocks for the life of the
    session (only driver GC of the RDD reclaims them) — fine for a
    build-once/query-forever index, but a long-lived session that builds
    indexes over many corpora accumulates pinned blocks. ``release()``
    (or using the index as a context manager) unpersists the checkpointed
    blocks deterministically; the index DataFrames are INVALID afterwards
    (their lineage was truncated to exactly those blocks — that's what a
    checkpoint is)."""

    def __init__(self, postings: DataFrame, doc_lengths: DataFrame,
                 owned_rdd_ids: set[int]):
        self.postings = postings
        self.doc_lengths = doc_lengths
        self._owned = owned_rdd_ids
        self._sc = postings.sparkSession.sparkContext

    def __iter__(self):  # tuple-compat: post, dls = bm25_index(...)
        return iter((self.postings, self.doc_lengths))

    def release(self) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()  # noqa: SLF001
        for rid in self._owned:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
        self._owned = set()

    def __enter__(self) -> "Bm25Index":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def _persistent_rdd_ids(sc) -> set[int]:
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())  # noqa: SLF001


def bm25_index(docs: DataFrame, id_col: str, text_col: str) -> Bm25Index:
    """(postings, doc_lengths), each materialized exactly once
    (localCheckpoint), wrapped in a ``Bm25Index`` handle (tuple-compatible)
    that owns the checkpointed blocks' lifetime. The index is the expensive
    artifact — one tokenize pass each — and every consumer (df aggregate,
    query scoring, scalar stats, workload derivation) re-references it;
    unmaterialized, each reference replays the corpus tokenize (no exchange
    reuse across self-references). This is also the honest production
    shape: the inverted index is built once and queried many times, not
    rebuilt per search batch. Long-lived sessions that build many indexes
    should ``release()`` retired ones (see Bm25Index)."""
    sc = docs.sparkSession.sparkContext
    before = _persistent_rdd_ids(sc)
    post = term_postings(docs, id_col, text_col).localCheckpoint(eager=True)
    dls = doc_lengths(docs, id_col, text_col).localCheckpoint(eager=True)
    return Bm25Index(post, dls, _persistent_rdd_ids(sc) - before)


def bm25_topk(docs: DataFrame, queries: DataFrame, id_col: str,
              text_col: str, k: int = BM25_TOPK,
              index: tuple[DataFrame, DataFrame] | None = None) -> DataFrame:
    """BM25 top-k documents per query. ``queries`` is (qid, term).
    ``index`` accepts a prebuilt ``bm25_index`` pair (built here when
    absent).

    Plan: postings ⋈ broadcast(queries) ⋈ doc-lengths ⋈ broadcast(scalars),
    fixed-point contribution per (qid, doc, term), exact integer sum per
    (qid, doc), per-qid window top-k. Returns (qid, rank, id, score_fx,
    score)."""
    from pyspark.sql import Window

    post, dls = index if index is not None else bm25_index(
        docs, id_col, text_col)
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))
    scalars = dls.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    scored = (post
              .join(F.broadcast(queries), "term")
              .join(F.broadcast(dfreq.join(queries, "term").select("term", "df")),
                    "term")
              .join(dls, id_col)
              .join(F.broadcast(scalars))
              .withColumn("contrib_fx", F.expr(BM25_CONTRIB_SQL)))
    per_doc = scored.groupBy("qid", id_col).agg(
        F.sum("contrib_fx").alias("score_fx"))
    w = Window.partitionBy("qid").orderBy(
        F.desc("score_fx"), F.asc(id_col))
    return (per_doc
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", id_col, "score_fx",
                    F.round(F.col("score_fx") / F.lit(float(BM25_FIXED)), 4)
                    .alias("score")))


# --- duplicated-passage detection (fixed-window exact-substring dedup) -----

PASSAGE_W = 12  # tokens per window, stride 1


def passage_windows_col(text: Column, w: int = PASSAGE_W) -> Column:
    """All w-token windows (stride 1, duplicates KEPT — positions matter);
    whole text as a single window when shorter than w. The non-distinct
    sibling of text.shingles_col."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - w, F.lit(0)))
    return F.when(n < w, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, w), " ")))


def passage_hashes_pd_df(docs: DataFrame, id_col: str, text_col: str,
                         w: int = PASSAGE_W,
                         carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, h): md5 of every w-token window (stride 1, duplicates kept,
    whole text as one window when shorter) via an Arrow batch UDF —
    byte-identical hashes to ``md5(passage_windows_col(...))``:

    * tokens come from the shared Python twin's regex + lower()
      (``dedup._py_shingles`` uses the same pair — parity already pinned);
    * the window string is the same " ".join of the same token slice;
    * Python ``hashlib.md5`` over UTF-8 equals JVM ``md5()`` of the same
      string (both hash the UTF-8 bytes).

    Exists because the expression form's transform/slice lambdas run
    interpreted and the hash projection has TWO consumers (the multi-doc
    hash set and the per-doc counters), so the interpreted cost was paid
    twice per query (test_passage_hash_arrow_form_agrees pins equality).

    NULL-text convention (deliberate, differs from the expression form): a
    null text emits NO window rows, so it is absent from downstream
    per-doc stats. The expression form emits one NULL-hash window (the
    same Catalyst artifact as shingles_col — and worse here: all null-text
    docs would collide on the null hash and mark each other as duplicated
    passages). No gate corpus contains null texts;
    test_null_text_conventions pins both behaviors.

    ``carry_cols`` are additional ``docs`` columns replicated verbatim onto
    every window row (e.g. the source/corpus tag for cross-group overlap) —
    carried through the map instead of re-joined onto the corpus-sized hash
    table afterwards, and without disturbing the id-keyed repartition.
    """
    import hashlib

    from .dedup import _TOKEN_RE

    def _rows(batches):
        for pdf in batches:
            ids, hs, keep = [], [], []
            for r, (i, t) in enumerate(zip(pdf[id_col].to_numpy(),
                                           pdf[text_col].to_numpy())):
                if t is None:
                    continue
                toks = _TOKEN_RE.findall(t.lower())
                wins = ([" ".join(toks)] if len(toks) < w else
                        [" ".join(toks[j:j + w])
                         for j in range(len(toks) - w + 1)])
                for s in wins:
                    ids.append(i)
                    hs.append(hashlib.md5(s.encode("utf-8")).hexdigest())
                    keep.append(r)
            out = {id_col: ids, "h": hs}
            for c in carry_cols:
                out[c] = pdf[c].to_numpy()[keep] if keep else pdf[c][:0]
            yield pd.DataFrame(out)

    fields = [f"{id_col} {docs.schema[id_col].dataType.simpleString()}",
              "h string"]
    fields += [f"{c} {docs.schema[c].dataType.simpleString()}"
               for c in carry_cols]
    base = docs.select(F.col(id_col), F.col(text_col),
                       *[F.col(c) for c in carry_cols])
    base = base.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    return base.mapInPandas(_rows, schema=", ".join(fields))


def duplicate_passage_stats(docs: DataFrame, id_col: str, text_col: str,
                            w: int = PASSAGE_W) -> DataFrame:
    """Per-document duplicated-passage profile: of the document's w-token
    windows, how many also occur (as md5-identical token windows) in at
    least one OTHER document. The fixed-window approximation of
    suffix-array exact-substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better") — windows hash-join instead of
    suffix-sort, so it's two shuffles at any scale.

    Returns (id, n_windows, n_dup_windows, dup_frac, has_dup_passage).
    """
    from pyspark.sql import Window

    hashed = passage_hashes_pd_df(docs, id_col, text_col, w)
    # ONE tokenize+md5 pass serves both counters (r14, guide §2.4): the
    # earlier two-consumer form (multi-doc hash set built from
    # hashed.distinct(), then hashed left-joined against it) re-ran the
    # Arrow window-hash pipeline per consumer — a whole extra corpus pass
    # at 100 TB — because exchange reuse only shares the pre-Arrow
    # repartition, not the Python stage above it. Collapsing duplicate
    # windows per (doc, hash) FIRST makes the per-h row count the exact
    # distinct-doc count, so the multi-doc predicate is a window count
    # over h on the already-aggregated (id, h, _c) rows — no second pass,
    # no self-join, and nothing materialized in session storage. Three
    # keyed exchanges total ((id,h) partial-agged, h, id), strictly fewer
    # than the old distinct + groupBy(h) + join(h) + groupBy(id) chain.
    cnt = hashed.groupBy(id_col, "h").agg(F.count("*").alias("_c"))
    ndocs = F.count("*").over(Window.partitionBy("h"))
    per_doc = (cnt.withColumn("_ndocs", ndocs)
               .groupBy(id_col)
               .agg(F.sum("_c").alias("n_windows"),
                    F.sum(F.when(F.col("_ndocs") >= 2, F.col("_c"))
                          .otherwise(F.lit(0))).alias("n_dup_windows")))
    return per_doc.select(
        id_col, "n_windows", "n_dup_windows",
        F.round(F.col("n_dup_windows") * F.lit(1.0) / F.col("n_windows"), 4)
        .alias("dup_frac"),
        (F.col("n_dup_windows") > 0).alias("has_dup_passage"))


# Per-passage distinct-group cap for the overlap matrix, same degenerate-
# bucket class as MAX_BUCKET/CONTAIN_MAX_DF: a passage present in g groups
# contributes g(g-1)/2 pair rows. Group cardinality is corpus-registry
# scale (tens..hundreds of sources), so the cap exists as a backstop for
# group keys with DATA-scale cardinality (e.g. web domains), where a
# boilerplate passage shared by millions of domains would explode ~1e12
# pairs that carry no mixing signal. Mirrored verbatim in the oracle.
OVERLAP_MAX_GROUPS = 1000


def cross_group_passage_overlap(docs: DataFrame, id_col: str, text_col: str,
                                group_col: str, w: int = PASSAGE_W,
                                max_groups: int = OVERLAP_MAX_GROUPS,
                                ) -> DataFrame:
    """Cross-corpus contamination matrix: for every pair of document groups
    (sources/corpora/snapshots), how many distinct w-token passages appear
    in BOTH — the pre-mixing report that tells you two "independent"
    sources are actually mirrors before they flood a training mix with
    near-identical text. Passage-level (not whole-doc fingerprints), so it
    catches partial syndication: shared paragraphs inside otherwise
    distinct documents.

    Returns ``(group_a, group_b, n_shared_passages, n_a, n_b,
    overlap_frac)`` with ``group_a < group_b`` and ``overlap_frac =
    shared / min(n_a, n_b)`` (containment of the smaller side, 4 dp).

    Scale shape: the Arrow window-hash projection carries the group tag
    through the map (no corpus-sized re-join); ``(group, h)`` dedups with
    ONE shuffle; the within-passage pair explode is bounded per hash by
    the number of GROUPS sharing it (``bucket_pairs`` on ``h``), never by
    document count — output is at most |groups|^2 matrix cells. The
    deduped ``(group, h)`` set is localCheckpointed (r14, guide §2.4):
    it feeds both the pair mining and the size aggregate, and exchange
    reuse only shared the pre-Arrow repartition — the window-hash Python
    pass and the distinct agg still re-executed per consumer. The pin is
    narrow (group tag + 32-char hash) and reclaimed by
    ``checkpoint_scope`` in long-lived sessions.
    """
    from .dedup import bucket_pairs

    gset = (passage_hashes_pd_df(docs, id_col, text_col, w,
                                 carry_cols=(group_col,))
            .select(group_col, "h").distinct()
            .localCheckpoint(eager=True))
    pairs = (bucket_pairs(gset, ["h"], F.col(group_col),
                          max_bucket=max_groups)
             .groupBy("a", "b")
             .agg(F.count("*").alias("n_shared_passages")))
    # both join sides broadcast the IDENTICAL subplan (aliased, not
    # re-projected), so ReuseExchange builds the size table once — the
    # rename-then-broadcast form re-executed the whole corpus pass per
    # side (plan-pinned by test_cross_group_overlap_single_size_build)
    sizes = gset.groupBy(group_col).agg(F.count("*").alias("n"))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (pairs
            .join(F.broadcast(sa), F.col("a") == F.col(f"sa.{group_col}"))
            .join(F.broadcast(sb), F.col("b") == F.col(f"sb.{group_col}"))
            .select(F.col("a").alias("group_a"), F.col("b").alias("group_b"),
                    "n_shared_passages",
                    F.col("sa.n").alias("n_a"), F.col("sb.n").alias("n_b"),
                    F.round(F.col("n_shared_passages") * F.lit(1.0)
                            / F.least(F.col("sa.n"), F.col("sb.n")), 4)
                    .alias("overlap_frac")))


# --- shingle containment (asymmetric near-superset detection) --------------

CONTAIN_MIN_SHARED = 5  # candidate pairs must share >= this many shingles

# Stop-shingle guard for the candidate self-join. A shingle shared by m
# documents emits m(m-1)/2 join rows BEFORE the min_shared HAVING can collapse
# anything, so one corpus-wide boilerplate shingle ("all rights reserved") in
# m=100k docs is 5e9 rows of pure noise — the same degenerate-bucket class the
# LSH operators cap with MAX_BUCKET. A shingle present in a large fraction of
# the corpus carries no containment SIGNAL either (sharing it says nothing
# about A being embedded in B), so dropping it from candidate generation is
# both the scale guard and a precision improvement. The threshold is relative
# (corpus-size-invariant, like the boilerplate detector's DF threshold) with
# an absolute floor so tiny corpora keep their legitimately-shared shingles:
# keep iff df <= FLOOR or df/n_docs <= NUM/DEN — integer-exact cross-multiply,
# mirrored verbatim in the DuckDB oracle.
CONTAIN_DF_FLOOR = 8       # shingles in <= this many docs are always kept
CONTAIN_DF_NUM = 1         # else keep iff df <= n_docs * NUM / DEN (5%)
CONTAIN_DF_DEN = 20
# Absolute cap on a shingle's document frequency, applied ON TOP of the
# relative guard. The relative 5% cap is corpus-size-RELATIVE, so at 100M
# docs a shingle just under it (df = 5M) would still collect 5M ids into
# one aggregate row and explode ~1.25e13 pairs from a single task. A
# shingle's df IS its bucket size in the pair explode, so this is the same
# bound MAX_BUCKET puts on every LSH path; past it, per-pair containment
# resolution on a 1000+-doc-shared shingle carries no signal the relative
# guard's rationale doesn't already dismiss. Mirrored verbatim in the
# oracle (querylib/search_linkage._containment_oracle).
CONTAIN_MAX_DF = 1000


def containment_pairs(docs: DataFrame, id_col: str, text_col: str,
                      k: int = 3,
                      min_shared: int = CONTAIN_MIN_SHARED,
                      df_floor: int = CONTAIN_DF_FLOOR,
                      df_num: int = CONTAIN_DF_NUM,
                      df_den: int = CONTAIN_DF_DEN,
                      max_df: int = CONTAIN_MAX_DF) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| for document pairs sharing at
    least ``min_shared`` distinct RARE k-shingles (document frequency within
    the stop-shingle guard — see ``CONTAIN_DF_FLOOR``). Containment (unlike
    Jaccard) catches a small document embedded inside a large one — quote
    farms, concatenated dumps.

    Candidate generation is the shingle self-join (same shape as
    dedup.ngram-jaccard) over guard-surviving shingles only, so per-shingle
    join fan-out is bounded by max(df_floor, n_docs*df_num/df_den) and a
    corpus-wide stop-shingle produces zero candidate rows instead of m^2/2.
    ``n_a`` (the containment denominator) still counts ALL of A's distinct
    shingles. The ``min_shared`` HAVING collapses the long tail before the
    size join. Returns (a, b, n_shared, n_a, containment_a) with a < b.
    """
    # Arrow shingles, not the expression form: the expression form's nested
    # transform/slice lambdas run interpreted (same sets, pinned by
    # test_impl_consistency; measured 16.6 s -> ~5 s for the sf0.1 gate
    # query from this swap alone). This projection has THREE consumers
    # (per-doc sizes, the DF guard, the guarded pair explode), so it is
    # localCheckpointed to execute ONCE — unmaterialized, each reference
    # replays the whole tokenize+shingle Arrow pass (no exchange reuse
    # across self-references; r14, same policy as bm25_index/semdedup).
    # The checkpoint holds the COMPACT (id, sh-array) rows, NOT the
    # exploded (id, shingle) rows: materializing the explosion was a
    # measured scale regression — the warm-session sf1 probe (the bench's
    # in-context exponent tier) paid 39 s vs 14 s unmaterialized, because
    # the exploded form multiplies block-storage rows ~|shingles|/|docs|x
    # while the explode itself is cheap codegen the consumers can re-run.
    # Per-doc sizes come straight off the array (shingle arrays are
    # distinct by construction, so n == size(sh)) with no explode at all.
    from .dedup import shingles_pd_df

    shc = (shingles_pd_df(docs, id_col, text_col, k)
           .localCheckpoint(eager=True))
    sh = shc.select(F.col(id_col), F.explode("sh").alias("s"))
    sizes = shc.select(F.col(id_col), F.size("sh").alias("n"))
    # document frequency per shingle: sh is distinct per (doc, shingle)
    # (shingles_col array_distincts), so COUNT(*) == #docs containing s.
    # The 1-row n_docs aggregate broadcasts; the keep predicate is exact
    # integer arithmetic so any engine agrees.
    scal = docs.agg(F.count("*").alias("n_docs"))
    ok = (sh.groupBy("s").agg(F.count("*").alias("df"))
          .join(F.broadcast(scal))
          .filter((F.col("df") <= df_floor)
                  | ((F.col("df") * df_den <= F.col("n_docs") * df_num)
                     & (F.col("df") <= max_df)))
          .select("s"))
    rare = sh.join(ok, "s", "left_semi")
    # within-bucket pair explode (bucket == shingle), the same shape as the
    # LSH candidate paths: ONE pass over the guarded shingle explode feeds
    # a single groupBy — the earlier two-sided self-join re-ran the
    # tokenize+shingle pipeline per join side (the projections differ, so
    # exchange reuse can't dedup them). Per-shingle fan-out is bounded by
    # the DF guard, now including the ABSOLUTE max_df cap (a shingle's df
    # is exactly its bucket size); max_bucket is passed through as a hard
    # backstop so the explode stays bounded even if a caller loosens the
    # guard. Pair counts are identical to the self-join's (each shared
    # surviving shingle contributes one (a, b) row before the per-pair
    # count).
    from .dedup import bucket_pairs

    # the backstop cap must not undercut the floor: a caller passing
    # max_df < df_floor would have bucket_pairs drop floor-protected
    # shingles (df <= floor passes the guard unconditionally) that the
    # oracle keeps — a silent Spark/oracle divergence for pathological
    # parameter combinations
    shared = (bucket_pairs(rare, ["s"], F.col(id_col),
                           max_bucket=max(max_df, df_floor))
              .groupBy("a", "b").agg(F.count("*").alias("n_shared"))
              .filter(F.col("n_shared") >= min_shared))
    return (shared
            .join(sizes.select(F.col(id_col).alias("a"),
                               F.col("n").alias("n_a")), "a")
            .select("a", "b", "n_shared", "n_a",
                    F.round(F.col("n_shared") * F.lit(1.0) / F.col("n_a"), 4)
                    .alias("containment_a")))
