"""Dedup queries over ``documents`` with fully value-checked DuckDB oracles.

The oracle SQL for MinHash/SimHash is GENERATED from the same constants the
Spark operators use (operators.dedup), so the two sides cannot silently
drift. All hashing is md5-based — the one hash both engines share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MAX_BUCKET,
    NUM_BANDS,
    NUM_HASHES,
    ROWS_PER_BAND,
    SHINGLE_K,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_pd_df,
)
from ..operators.text import fingerprint_col
from ..sources.registry import load_table
from . import register

# ------------------------------------------------------------------ SQL twins

from ..functions.portable import TOKENS_SQL as _TOKENS_SQL  # noqa: E402
from ..functions.portable import shingles_sql  # noqa: E402

_SHINGLES_SQL = shingles_sql(SHINGLE_K)


def _hex_to_bigint_sql(expr: str, start: int, width: int = 13) -> str:
    """Parse hex chars [start, start+width) of ``expr`` into a BIGINT
    (DuckDB has no conv(); instr over the hex alphabet is portable)."""
    return "(" + " + ".join(
        f"(instr('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (width - 1 - i)}"
        for i in range(width)) + ")"


def _minhash_oracle(threshold: float) -> str:
    # twin of operators.dedup.minhash_signatures: one md5 per shingle, 52-bit
    # hex-half integers, affine family min(h1 + j*h2). Mirrors the Spark
    # side's exact-dup pre-collapse (collapse_exact_reps: bands computed over
    # min-id fingerprint representatives) and the MAX_BUCKET degenerate-
    # bucket guard (buckets over the cap emit no candidate pairs).
    sig_exprs = ",\n           ".join(
        f"MIN(h1 + {j} * h2) AS sig{j}" for j in range(NUM_HASHES))
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM sig".format(
            b=b,
            concat=" || ',' || ".join(
                f"CAST(sig{j} AS VARCHAR)"
                for j in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)))
        for b in range(NUM_BANDS))
    return f"""
    WITH reps AS (
      SELECT MIN(doc_id) AS doc_id, arg_min(text, doc_id) AS text
      FROM (SELECT doc_id, text,
                   md5(array_to_string({_TOKENS_SQL}, ' ')) AS f
            FROM documents)
      GROUP BY f
    ), sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
    ), rsh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS sh FROM reps
    ), hs AS (
      SELECT doc_id,
             {_hex_to_bigint_sql('h', 1)} AS h1,
             {_hex_to_bigint_sql('h', 14)} AS h2
      FROM (SELECT doc_id, md5(unnest(sh)) AS h FROM rsh)
    ), sig AS (
      SELECT doc_id,
           {sig_exprs}
      FROM hs GROUP BY doc_id
    ), bands AS (
      {band_selects}
    ), ok AS (
      SELECT band_idx, band_hash FROM bands
      GROUP BY band_idx, band_hash
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET}
    ), cand AS (
      SELECT DISTINCT b1.doc_id AS id_a, b2.doc_id AS id_b
      FROM bands b1
      JOIN bands b2 ON b1.band_idx = b2.band_idx
                   AND b1.band_hash = b2.band_hash
                   AND b1.doc_id < b2.doc_id
      JOIN ok ON b1.band_idx = ok.band_idx AND b1.band_hash = ok.band_hash
    )
    SELECT id_a, id_b, jaccard FROM (
      SELECT cand.id_a, cand.id_b,
             ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                   / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1), 4)
               AS jaccard
      FROM cand
      JOIN sh a ON cand.id_a = a.doc_id
      JOIN sh b ON cand.id_b = b.doc_id)
    WHERE jaccard >= {threshold}
    """


def _simhash_oracle(from_sql: str = "documents") -> str:
    """Degenerate-input semantics made EXPLICIT so the two engines cannot
    drift (they did, silently, before COALESCE was added here):

    * zero-token text ('!!!'): every vote list is empty; DuckDB
      list_sum([]) is NULL, so without COALESCE each bit term fell to
      ELSE 0 while Spark's empty-majority (>= 0) sets every bit. COALESCE
      pins both engines to all-bits-set.
    * NULL text: hs is NULL -> explicit CASE emits 0, matching
      simhash_df's null_text branch.

    Twin of operators.dedup.token_hash_col / simhash_df: each token's md5
    is parsed ONCE into a 60-bit integer (first 15 hex chars), then bit i
    of the code is the majority of bit i across tokens.
    """
    bit_terms = []
    for i in range(SIMHASH_BITS):
        term = (
            f"CASE WHEN COALESCE(list_sum(list_transform(hs, v -> "
            f"CASE WHEN (v // {2 ** i}) % 2 = 1 THEN 1 ELSE -1 END)), 0) >= 0 "
            f"THEN {2 ** i} ELSE 0 END")
        bit_terms.append(term)
    total = "\n         + ".join(bit_terms)
    tok_hash = _hex_to_bigint_sql("md5(t)", 1, SIMHASH_BITS // 4)
    return f"""
    WITH hs AS (
      SELECT doc_id, list_transform({_TOKENS_SQL}, t -> {tok_hash}) AS hs
      FROM {from_sql}
    )
    SELECT doc_id,
           CASE WHEN hs IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST({total} AS BIGINT) END AS simhash
    FROM hs
    """


# ------------------------------------------------------------------- queries

@register(
    "dedup_exact_fingerprint",
    f"""
    SELECT md5(array_to_string({_TOKENS_SQL}, ' ')) AS fingerprint,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup on the token-normalized md5 fingerprint: one hash "
        "shuffle on the fingerprint, deterministic min-id representative.")
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_fp = d.select(fingerprint_col(F.col("text")).alias("fingerprint"), "doc_id")
    return exact_dedup(with_fp, ["fingerprint"], "doc_id")


@register(
    "dedup_exact_with_duplicates",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
    )
    SELECT md5(array_to_string({_TOKENS_SQL}, ' ')) AS fingerprint,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY 1
    """,
    doc="Exact dedup over a corpus that actually CONTAINS duplicates (every "
        "third doc re-ingested under a new id): duplicated fingerprints "
        "collapse to the min-id original with n_copies=2 — the "
        "representative-election semantics shown doing real work.")
def dedup_exact_with_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = (d.filter(F.col("doc_id") % 3 == 0)
             .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    corpus = d.unionByName(dupes)
    with_fp = corpus.select(fingerprint_col(F.col("text")).alias("fingerprint"),
                            "doc_id")
    return exact_dedup(with_fp, ["fingerprint"], "doc_id")


@register(
    "dedup_minhash_lsh",
    _minhash_oracle(threshold=0.5),
    doc=f"MinHash-LSH near-dup pairs: {NUM_HASHES} md5-minhashes, "
        f"{NUM_BANDS} bands x {ROWS_PER_BAND} rows, exact-Jaccard verify "
        ">= 0.5. Fully value-checked against DuckDB (md5-portable LSH).")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)


@register(
    "dedup_simhash",
    _simhash_oracle(),
    doc=f"{SIMHASH_BITS}-bit SimHash signature per document (bit-majority "
        "over token md5s) — integer-exact across engines; Arrow-vectorized "
        "(simhash_pd_df, bit-identical to the codegen form by test).")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_pd_df(d, "doc_id", "text")


_SIMHASH_PAIR_HAMMING = SIMHASH_BANDS - 1

# The raw synthetic corpus has no near-dups at 60-bit resolution (random
# pairs sit at hamming ~30), so the pairs query injects mutated copies —
# every 5th doc re-ingested with one appended token — the same
# corpus-with-actual-duplicates pattern dedup_exact_with_duplicates uses.
# One extra token nudges each bit's vote sum by +-1, flipping only
# boundary bits: long docs land within hamming<=3 of their original.
_MUTATED_CORPUS_SQL = """(
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' qq' AS text
  FROM documents WHERE doc_id % 5 = 0
)"""


def _simhash_pairs_oracle() -> str:
    """Banded SimHash near-dup: candidates share at least one of the 4
    15-bit bands of the 60-bit code, verified by hamming (xor + bit_count)
    <= 3. 4 bands is the pigeonhole minimum for hamming<=3: the differing
    bits can corrupt at most 3 bands, so one band always survives intact.
    15-bit bands give 32768 values per band, so bucket sizes stay ~n/2^15
    and the candidate join is O(n x bands) — the earlier 4-bit bands had
    only 16 values and went quadratic on any large corpus."""
    band_width = 2 ** SIMHASH_BAND_BITS
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, simhash, "
        f"(simhash // {2 ** (SIMHASH_BAND_BITS * b)}) % {band_width} AS band, "
        f"{b} AS band_idx FROM s"
        for b in range(SIMHASH_BANDS))
    return f"""
    WITH s AS ({_simhash_oracle(from_sql=_MUTATED_CORPUS_SQL)}),
    bands AS (
      {bands}
    ),
    ok AS (
      SELECT band_idx, band FROM bands
      GROUP BY band_idx, band
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
      JOIN ok ON a.band_idx = ok.band_idx AND a.band = ok.band
    )
    SELECT id_a, id_b, hamming FROM (
      SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming FROM cand)
    WHERE hamming <= {_SIMHASH_PAIR_HAMMING}
    """


@register(
    "dedup_simhash_pairs",
    _simhash_pairs_oracle(),
    doc=f"SimHash near-dup pairs over a corpus with injected mutated "
        f"copies: {SIMHASH_BANDS} bands x {SIMHASH_BAND_BITS} bits of the "
        f"{SIMHASH_BITS}-bit code for candidates (pigeonhole at exactly the "
        f"hamming<={_SIMHASH_PAIR_HAMMING} verify threshold; 2^15 values "
        "per band keeps the join linear), exact hamming verify via "
        "xor+bit_count.")
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = (d.filter(F.col("doc_id") % 5 == 0)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" qq")).alias("text")))
    corpus = d.unionByName(mutated)
    s = simhash_pd_df(corpus, "doc_id", "text")
    return simhash_pairs(s, max_hamming=_SIMHASH_PAIR_HAMMING)


@register(
    "dedup_cluster_representatives",
    f"""
    WITH pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (
      SELECT id_a AS id, id_b AS nbr FROM pairs
      UNION ALL SELECT id_b AS id, id_a AS nbr FROM pairs
      UNION ALL SELECT doc_id AS id, doc_id AS nbr FROM documents
    )
    SELECT id AS doc_id, MIN(nbr) AS cluster_repr,
           COUNT(*) - 1 AS n_neighbors
    FROM edges GROUP BY id
    """,
    doc="Near-dup cluster representative assignment: one min-id propagation "
        "step over the MinHash-LSH pair graph (each doc adopts the smallest "
        "id among itself + verified neighbors). At scale this is the body of "
        "the iterate-until-fixpoint connected-components loop (large-star/"
        "small-star); a single deterministic step keeps it oracle-checkable.")
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    edges = (
        pairs.select(F.col("id_a").alias("id"), F.col("id_b").alias("nbr"))
        .unionByName(
            pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nbr")))
        .unionByName(
            d.select(F.col("doc_id").alias("id"), F.col("doc_id").alias("nbr"))))
    return (edges.groupBy("id")
            .agg(F.min("nbr").alias("cluster_repr"),
                 (F.count(F.lit(1)) - 1).alias("n_neighbors"))
            .select(F.col("id").alias("doc_id"), "cluster_repr", "n_neighbors"))


@register(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.a AS id, reach.r
      FROM edges e JOIN reach ON e.b = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS component
    FROM reach GROUP BY id
    """,
    doc="True connected components over the MinHash near-dup graph: "
        "iterative min-label propagation to fixpoint (Spark driver loop of "
        "join+agg rounds with checkpoint lineage truncation) vs a DuckDB "
        "recursive-CTE transitive closure. The unique fixpoint makes an "
        "iterative algorithm oracle-checkable.")
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    vertices = d.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(vertices, edges)
    return cc.select(F.col("id").alias("doc_id"), "component")


@register(
    "dedup_ngram_jaccard_blocked",
    f"""
    WITH sh AS (
      SELECT doc_id, lang, source, n_chars // 100 AS len_bucket,
             {_SHINGLES_SQL} AS sh
      FROM documents
    )
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                   / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1), 4)
               AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
                         AND a.len_bucket = b.len_bucket
                         AND a.doc_id < b.doc_id)
    WHERE jaccard >= 0.2
    """,
    doc="Exact n-gram Jaccard pairs within (lang, source, length-bucket) "
        "blocks — the blocked exact-verify pattern; block keys bound the "
        "pair explosion to O(sum block^2).")
def dedup_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (load_table(spark, sf_dir, "documents")
         .withColumn("len_bucket", F.floor(F.col("n_chars") / 100)))
    return ngram_jaccard_pairs(d, "doc_id", "text",
                               ["lang", "source", "len_bucket"], threshold=0.2)


@register(
    "dedup_decontaminate_benchmark",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
    ), bench AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 100 = 0
    ), corpus AS (
      SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 100 <> 0
    ), hits AS (
      SELECT corpus.doc_id, COUNT(*) AS n_shared
      FROM corpus JOIN bench ON corpus.s = bench.s
      GROUP BY corpus.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared_shingles,
           COALESCE(n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d
    LEFT JOIN hits ON d.doc_id = hits.doc_id
    """,
    doc="Benchmark decontamination: flag training docs sharing any token "
        "3-shingle with the eval set (docs with doc_id % 100 = 0 stand in "
        "for a benchmark). The canonical n-gram-overlap decontamination "
        "pass of an LLM data pipeline. Plan shape at 100 TB: the benchmark "
        "shingle set is tiny and BROADCAST, so the corpus scan streams "
        "map-side through the semi-join — the corpus never shuffles until "
        "the per-doc count, which carries only matching (doc, shingle) "
        "rows. Never O(corpus x benchmark).")
def dedup_decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import shingles_col

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", shingles_col(F.col("text"), SHINGLE_K).alias("sh"))
    bench = (sh.filter(F.col("doc_id") % 100 == 0)
             .select(F.explode("sh").alias("s")).distinct())
    corpus = (sh.filter(F.col("doc_id") % 100 != 0)
              .select("doc_id", F.explode("sh").alias("s")).distinct())
    hits = (corpus.join(F.broadcast(bench), "s")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared")))
    base = d.filter(F.col("doc_id") % 100 != 0).select("doc_id")
    return (base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shared"), F.lit(0).cast("long"))
            .alias("n_shared_shingles"),
        (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated")))


@register(
    "dedup_decontaminate_benchmark_aho",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
    ), bench AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 100 = 0
    ), benchk AS (
      SELECT s FROM bench WHERE len(string_split(s, ' ')) = {SHINGLE_K}
    ), corpus AS (
      SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh
      WHERE doc_id % 100 <> 0
    ), hits AS (
      SELECT corpus.doc_id, COUNT(*) AS n_shared
      FROM corpus JOIN benchk ON corpus.s = benchk.s
      GROUP BY corpus.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared_shingles,
           COALESCE(n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d
    LEFT JOIN hits ON d.doc_id = hits.doc_id
    """,
    doc="The Aho-Corasick SCALE PATH of the n-gram benchmark "
        "decontamination pass (VERDICT r10 #9): same benchmark, same "
        "per-doc distinct-shared-shingle report as "
        "dedup_decontaminate_benchmark, but instead of exploding the "
        "corpus into (doc, shingle) rows for a broadcast semi-join "
        "(output-volume O(corpus shingles)), the benchmark shingles "
        "become space-padded needles in a per-worker automaton and the "
        "corpus streams ONCE as padded token strings through "
        "mapInPandas — O(|text|) per document regardless of benchmark "
        "size, no explode, no shuffle before the per-doc count. The "
        "plan at 10^5+ benchmark docs. Needles keep only exactly-"
        "k-token shingles (a shorter-than-k shingle from a tiny "
        "benchmark doc is a whole-text fingerprint, not an n-gram — "
        "the set-intersection form can only match it against an "
        "equally tiny corpus doc, never mid-stream), mirrored in the "
        "oracle's benchk filter.")
def dedup_decontaminate_benchmark_aho(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    from ..operators.decontaminate import substring_hits_aho
    from ..operators.text import shingles_col, tokens_col

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id",
                  shingles_col(F.col("text"), SHINGLE_K).alias("sh"))
    bench = (sh.filter(F.col("doc_id") % 100 == 0)
             .select(F.explode("sh").alias("s"))
             .filter(F.size(F.split(F.col("s"), " ")) == SHINGLE_K)
             .select(F.concat(F.lit(" "), F.col("s"), F.lit(" "))
                     .alias("canary"))
             .distinct())
    corpus = (d.filter(F.col("doc_id") % 100 != 0)
              .select("doc_id",
                      F.concat(F.lit(" "),
                               F.array_join(tokens_col(F.col("text")),
                                            " "),
                               F.lit(" ")).alias("stream")))
    hits = substring_hits_aho(corpus, "doc_id", "stream", bench)
    return hits.select(
        "doc_id",
        F.col("n_hits").alias("n_shared_shingles"),
        (F.col("n_hits") > 0).alias("contaminated"))


@register(
    "dedup_incremental_new_docs",
    f"""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string({_TOKENS_SQL}, ' ')) AS fingerprint
      FROM documents
    ), history AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 400
    )
    SELECT f.doc_id, f.fingerprint,
           h.fingerprint IS NOT NULL AS seen_before
    FROM fp f LEFT JOIN history h ON f.fingerprint = h.fingerprint
    WHERE f.doc_id >= 400
    """,
    doc="Incremental ingest dedup: fingerprint the NEW batch (doc_id >= "
        "400) and mark which docs already exist in the historical corpus "
        "(doc_id < 400) by md5 content fingerprint. The batch-incremental "
        "form of exact dedup a continuously-fed pipeline runs on every "
        "ingest: at 100 TB the history side is a fingerprint-only "
        "projection (32-byte hashes, not documents) read from the "
        "fingerprint column stored at ingest, and the new batch is tiny — "
        "AQE broadcasts it, so the history scan streams map-side and "
        "nothing large shuffles.")
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))
    history = (fp.filter(F.col("doc_id") < 400)
               .select("fingerprint").distinct()
               .withColumn("seen", F.lit(True)))
    new_batch = fp.filter(F.col("doc_id") >= 400)
    return (new_batch.join(history, "fingerprint", "left")
            .select("doc_id", "fingerprint",
                    F.coalesce(F.col("seen"), F.lit(False)).alias("seen_before")))


@register(
    "dedup_connected_components_star",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.a AS id, reach.r
      FROM edges e JOIN reach ON e.b = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS component
    FROM reach GROUP BY id
    """,
    doc="Connected components via alternating large-star/small-star "
        "contraction (Kiveris et al.) over the same MinHash near-dup "
        "graph — the O(log n)-round scale path for HIGH-diameter graphs, "
        "where per-round min-label propagation needs diameter-many rounds. "
        "Identical unique fixpoint, so it shares the recursive-CTE oracle "
        "with dedup_connected_components; tests additionally pin equality "
        "of both algorithms on random and 400-node-path graphs.")
def dedup_connected_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components_star

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    vertices = d.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components_star(vertices, edges)
    return cc.select(F.col("id").alias("doc_id"), "component")


@register(
    "dedup_corpus_kept",
    f"""
    WITH RECURSIVE fp AS (
      SELECT doc_id, md5(array_to_string({_TOKENS_SQL}, ' ')) AS f
      FROM documents
    ), rep AS (
      SELECT f, MIN(doc_id) AS rid FROM fp GROUP BY f
    ), doc2rep AS (
      SELECT fp.doc_id, rep.rid FROM fp JOIN rep ON fp.f IS NOT DISTINCT FROM rep.f
    ), pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach(id, r) AS (
      SELECT rid AS id, rid AS r FROM rep
      UNION
      SELECT e.a AS id, reach.r
      FROM edges e JOIN reach ON e.b = reach.id
    ),
    comp AS (
      SELECT id, MIN(r) AS c FROM reach GROUP BY id
    )
    SELECT comp.c AS kept_doc_id,
           COUNT(*) AS n_members,
           COUNT(DISTINCT d2r.rid) AS n_neardup_groups
    FROM doc2rep d2r JOIN comp ON d2r.rid = comp.id
    GROUP BY comp.c
    """,
    doc="End-to-end dedup APPLICATION — the query a training pipeline "
        "actually runs to shrink the corpus: exact duplicates collapse to "
        "min-id representatives (fingerprint groupBy), MinHash-LSH pairs + "
        "connected components merge near-duplicate representatives, and "
        "each final cluster keeps its min-id doc. One row per kept "
        "document with its member count (exact copies + near-dups "
        "absorbed) and how many exact-dup groups the cluster merged. "
        "Composes collapse_exact_reps/minhash_lsh_pairs/"
        "connected_components — every stage is the already-plan-audited "
        "scale shape; the extra cost over pair mining is one fingerprint "
        "join and the O(log n)-round CC loop over the (tiny) rep pair "
        "graph.")
def dedup_corpus_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", fingerprint_col(F.col("text")).alias("f"))
    rep = fp.groupBy("f").agg(F.min("doc_id").alias("rid"))
    doc2rep = (fp.join(rep.withColumnRenamed("f", "f2"),
                       fp["f"].eqNullSafe(F.col("f2")))
               .select("doc_id", "rid"))
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    vertices = rep.select(F.col("rid").alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(vertices, edges)
    final = doc2rep.join(cc, doc2rep["rid"] == cc["id"])
    return (final.groupBy(F.col("component").alias("kept_doc_id"))
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.countDistinct("rid").alias("n_neardup_groups")))


NEW_BATCH_START = 400  # doc_id boundary: history < 400, new batch >= 400


def _side_sig_band_ctes(src: str, p: str) -> str:
    """sig + bands CTEs over source CTE ``src`` (columns doc_id, text),
    prefixed ``p`` — the per-side building block for the incremental
    near-dup oracle (same 52-bit affine MinHash as _minhash_oracle)."""
    sig_exprs = ",\n           ".join(
        f"MIN(h1 + {j} * h2) AS sig{j}" for j in range(NUM_HASHES))
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM {p}sig".format(
            b=b, p=p,
            concat=" || ',' || ".join(
                f"CAST(sig{j} AS VARCHAR)"
                for j in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)))
        for b in range(NUM_BANDS))
    return f"""
    {p}sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS sh FROM {src}
    ), {p}hs AS (
      SELECT doc_id,
             {_hex_to_bigint_sql('h', 1)} AS h1,
             {_hex_to_bigint_sql('h', 14)} AS h2
      FROM (SELECT doc_id, md5(unnest(sh)) AS h FROM {p}sh)
    ), {p}sig AS (
      SELECT doc_id,
           {sig_exprs}
      FROM {p}hs GROUP BY doc_id
    ), {p}bands AS (
      {band_selects}
    )"""


def _incremental_neardup_oracle(threshold: float = 0.5) -> str:
    return f"""
    WITH hist AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {NEW_BATCH_START}
    ), newb AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= {NEW_BATCH_START}
    ), {_side_sig_band_ctes('hist', 'h_')},
    {_side_sig_band_ctes('newb', 'n_')},
    ok AS (
      SELECT band_idx, band_hash FROM h_bands
      GROUP BY band_idx, band_hash HAVING COUNT(*) <= {MAX_BUCKET}
    ), cand AS (
      SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id
      FROM n_bands n
      JOIN h_bands h ON n.band_idx = h.band_idx AND n.band_hash = h.band_hash
      JOIN ok ON h.band_idx = ok.band_idx AND h.band_hash = ok.band_hash
    ), scored AS (
      SELECT new_id, hist_id, jaccard FROM (
        SELECT cand.new_id, cand.hist_id,
               ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                     / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1), 4)
                 AS jaccard
        FROM cand
        JOIN n_sh a ON cand.new_id = a.doc_id
        JOIN h_sh b ON cand.hist_id = b.doc_id)
      WHERE jaccard >= {threshold}
    ), best AS (
      SELECT new_id, hist_id, jaccard FROM (
        SELECT new_id, hist_id, jaccard,
               ROW_NUMBER() OVER (PARTITION BY new_id
                                  ORDER BY jaccard DESC, hist_id) AS rn
        FROM scored)
      WHERE rn = 1
    )
    SELECT nb.doc_id,
           best.hist_id IS NOT NULL AS has_near_dup,
           best.hist_id AS best_match_id,
           best.jaccard AS best_jaccard
    FROM newb nb LEFT JOIN best ON nb.doc_id = best.new_id
    """


@register(
    "dedup_incremental_neardup",
    _incremental_neardup_oracle(),
    doc="Batch-incremental NEAR-dup: each new document (doc_id >= 400) gets "
        "its best MinHash-LSH near-duplicate from the historical corpus "
        "(doc_id < 400), argmax jaccard with id tie-break, or "
        "has_near_dup=false. The every-ingest complement to "
        "dedup_incremental_new_docs (exact): at 100 TB the history bands "
        "are a stored index, the new batch broadcasts, nothing "
        "history-sized shuffles.")
def dedup_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_neardup

    d = load_table(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") < NEW_BATCH_START).select("doc_id", "text")
    newb = d.filter(F.col("doc_id") >= NEW_BATCH_START).select("doc_id", "text")
    return incremental_neardup(hist, newb, "doc_id", "text", threshold=0.5)


def _pagerank_oracle() -> str:
    from ..operators.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_SCALE

    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE) // PR_DAMP_DEN
    parts = [f"""
    pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
    deg AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src),
    pr0 AS (SELECT doc_id AS id, CAST({PR_SCALE} AS BIGINT) AS pr
            FROM documents)"""]
    for i in range(PR_ITERS):
        parts.append(f"""
    c{i} AS (
      SELECT e.dst AS to_id, pr.pr // d.deg AS c
      FROM edges e JOIN pr{i} pr ON e.src = pr.id JOIN deg d ON d.id = e.src),
    s{i} AS (SELECT to_id, CAST(SUM(c) AS BIGINT) AS s FROM c{i} GROUP BY to_id),
    pr{i + 1} AS (
      SELECT v.id,
             CAST({base} + ({PR_DAMP_NUM} * COALESCE(s.s, 0)) // {PR_DAMP_DEN}
                  AS BIGINT) AS pr
      FROM pr0 v LEFT JOIN s{i} s ON v.id = s.to_id)""")
    return ("WITH RECURSIVE " + ",".join(parts)
            + f"\n    SELECT id AS doc_id, pr FROM pr{PR_ITERS}")


@register(
    "graph_pagerank_exact",
    _pagerank_oracle(),
    doc="Fixed-point integer PageRank (2 rounds, damping 85/100, scale "
        "1e12) over the MinHash near-duplicate graph: every contribution "
        "and damped sum is exact int64 floor arithmetic, so the iterative "
        "algorithm value-checks against unrolled CTEs — floats would make "
        "Spark's nondeterministic aggregation order observable. Per round: "
        "one shuffle on the destination id; isolated docs hold the "
        "teleport mass.")
def graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_exact

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    vertices = d.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    pr = pagerank_exact(vertices, edges)
    return pr.select(F.col("id").alias("doc_id"), "pr")


from ..functions.portable import QUALITY_SQL as _QUALITY_SQL  # noqa: E402


@register(
    "dedup_cluster_keep_best",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.a AS id, reach.r
      FROM edges e JOIN reach ON e.b = reach.id
    ),
    comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
    q AS (SELECT doc_id, ROUND({_QUALITY_SQL}, 4) AS quality FROM documents),
    j AS (SELECT comp.component, comp.doc_id, q.quality
          FROM comp JOIN q ON comp.doc_id = q.doc_id)
    SELECT component, doc_id AS best_doc_id, quality AS best_quality,
           cluster_size
    FROM (
      SELECT component, doc_id, quality,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY quality DESC, doc_id ASC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
               AS cluster_size
      FROM j)
    WHERE rn = 1
    """,
    doc="Content-aware dedup keeper selection: per near-dup cluster "
        "(connected components over the MinHash pair graph), keep the "
        "HIGHEST-QUALITY member instead of the min-id one — the policy a "
        "production corpus actually wants (near-dup groups usually contain "
        "one clean copy and several mangled ones). Quality is the gated "
        "heuristic score rounded to a shared 4-dp grid so the argmax is "
        "engine-portable; ties break on doc_id. One aggregate over the CC "
        "labels; the quality join is by doc id (no extra corpus shuffle "
        "beyond the label join itself).")
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components
    from ..operators.text import quality_score_col

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    vertices = d.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(vertices, edges)
    q = d.select(F.col("doc_id"),
                 F.round(quality_score_col(F.col("text")), 4).alias("quality"))
    j = cc.join(q, cc.id == q.doc_id).select("component", "doc_id", "quality")
    return (j.groupBy("component")
            .agg(F.max_by("doc_id",
                          F.struct(F.col("quality"), (-F.col("doc_id"))))
                 .alias("best_doc_id"),
                 F.max("quality").alias("best_quality"),
                 F.count(F.lit(1)).alias("cluster_size")))


@register(
    "dedup_cluster_size_histogram",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(threshold=0.5)}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.a AS id, reach.r
      FROM edges e JOIN reach ON e.b = reach.id
    ),
    comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
    sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY component)
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    doc="Near-dup cluster-size histogram — the dedup-rate telemetry a "
        "corpus pipeline reports per ingest (size-1 clusters = unique "
        "docs; the tail shows duplication mass): CC labels -> per-"
        "component size -> size distribution. Two tiny aggregates after "
        "the clustering; everything is |components|-bounded past the "
        "label join.")
def dedup_cluster_size_histogram(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)
    cc = connected_components(
        d.select(F.col("doc_id").alias("id")),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"))
            .select("cluster_size", "n_clusters",
                    (F.col("cluster_size") * F.col("n_clusters"))
                    .alias("n_docs")))


_CANARY_POS, _CANARY_LEN = 11, 12


@register(
    "dedup_decontaminate_substring",
    f"""
    WITH bench AS (
      SELECT DISTINCT substring(text, {_CANARY_POS}, {_CANARY_LEN}) AS canary
      FROM documents WHERE doc_id % 100 = 0
        AND length(substring(text, {_CANARY_POS}, {_CANARY_LEN}))
            = {_CANARY_LEN}
    ), hits AS (
      SELECT d.doc_id, COUNT(*) AS n_hits
      FROM documents d JOIN bench ON contains(d.text, bench.canary)
      WHERE d.doc_id % 100 <> 0
      GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_canary_hits,
           COALESCE(n_hits, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d
    LEFT JOIN hits ON d.doc_id = hits.doc_id
    """,
    doc="EXACT-SUBSTRING benchmark decontamination — the canary-detection "
        "complement of the shingle-overlap pass "
        "(dedup_decontaminate_benchmark catches paraphrase-level token "
        "overlap; this catches verbatim inclusion of an eval string, "
        "punctuation and all — the GPT-3-appendix-style exact-match "
        "check). A fixed 12-char slice of every benchmark doc (doc_id % "
        "100 = 0) is the canary (real canaries run 40+ chars; the short "
        "slice keeps the HIT path non-trivial on the synthetic corpus, "
        "which has no verbatim 40-char repeats); a training doc is "
        "contaminated when its "
        "RAW text contains any canary as a substring. Plan shape at 100 "
        "TB: the canary set is benchmark-sized, deduped, and BROADCAST; "
        "the corpus streams once through a BroadcastNestedLoopJoin whose "
        "predicate is the codegen'd contains() — O(corpus x |canaries|) "
        "character scans, never a corpus shuffle (only matching (doc, "
        "canary) rows reach the per-doc count). For 10^5+ canaries, swap "
        "the nested loop for an Aho-Corasick automaton in a mapInPandas "
        "pass — the broadcast-the-needles model is unchanged.")
def dedup_decontaminate_substring(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    canary = F.substring(F.col("text"), _CANARY_POS, _CANARY_LEN)
    bench = (d.filter(F.col("doc_id") % 100 == 0)
             .select(canary.alias("canary"))
             .filter(F.length("canary") == _CANARY_LEN).distinct())
    corpus = d.filter(F.col("doc_id") % 100 != 0).select("doc_id", "text")
    hits = (corpus.join(F.broadcast(bench),
                        F.expr("contains(text, canary)"))
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits")))
    base = d.filter(F.col("doc_id") % 100 != 0).select("doc_id")
    return (base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
            .alias("n_canary_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated")))


@register(
    "dedup_decontaminate_substring_aho",
    f"""
    WITH bench AS (
      SELECT DISTINCT substring(text, {_CANARY_POS}, {_CANARY_LEN}) AS canary
      FROM documents WHERE doc_id % 100 = 0
        AND length(substring(text, {_CANARY_POS}, {_CANARY_LEN}))
            = {_CANARY_LEN}
    ), hits AS (
      SELECT d.doc_id, COUNT(*) AS n_hits
      FROM documents d JOIN bench ON contains(d.text, bench.canary)
      WHERE d.doc_id % 100 <> 0
      GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_canary_hits,
           COALESCE(n_hits, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d
    LEFT JOIN hits ON d.doc_id = hits.doc_id
    """,
    doc="The Aho-Corasick SCALE PATH of the exact-substring "
        "decontamination gate (operators/decontaminate.py) — same needle "
        "set, same report, same DuckDB oracle as "
        "dedup_decontaminate_substring, but the corpus streams ONCE "
        "through a per-worker automaton in mapInPandas: O(|text|) per "
        "document regardless of canary count, vs the contains() nested "
        "loop's O(|text| x |canaries|). This is the plan at 10^5+ "
        "canaries (a real eval-suite sweep); the broadcast-the-needles "
        "model and the output contract are unchanged, which the shared "
        "oracle pins.")
def dedup_decontaminate_substring_aho(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    from ..operators.decontaminate import decontaminate_report_aho

    d = load_table(spark, sf_dir, "documents")
    canary = F.substring(F.col("text"), _CANARY_POS, _CANARY_LEN)
    bench = (d.filter(F.col("doc_id") % 100 == 0)
             .select(canary.alias("canary"))
             .filter(F.length("canary") == _CANARY_LEN).distinct())
    corpus = d.filter(F.col("doc_id") % 100 != 0).select("doc_id", "text")
    return decontaminate_report_aho(corpus, "doc_id", "text", bench)
