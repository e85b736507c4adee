"""The bulk (explode/codegen) and column-expression forms of SimHash and LSH
bucketing must produce byte-identical results — they share oracle SQL twins,
so silent divergence would surface as confusing gate failures later."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.dedup import simhash_col, simhash_df
from databricks_import_pyspark_scripts_spark.operators.similarity import (
    lsh_bucket_col,
    lsh_buckets_df,
)
from databricks_import_pyspark_scripts_spark.sources.registry import load_table


def test_simhash_forms_agree(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(100)
    wide = {r.doc_id: r.s for r in
            d.select("doc_id", simhash_col(F.col("text")).alias("s")).collect()}
    bulk = {r.doc_id: r.simhash for r in simhash_df(d, "doc_id", "text").collect()}
    assert wide == bulk


def test_lsh_bucket_forms_agree(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(100)
    col_form = {r.vec_id: r.b for r in
                e.select("vec_id",
                         lsh_bucket_col(F.col("embedding")).alias("b")).collect()}
    df_form = {r.vec_id: r.bucket for r in
               lsh_buckets_df(e, "vec_id", "embedding").collect()}
    assert col_form == df_form


def test_lsh_table_bucket_arrow_form_agrees(spark, sf_dir):
    """The Arrow int-matmul bucket build must be byte-identical to the
    exploded-aggregation form on real float32 embeddings — both feed queries
    that share one DuckDB oracle. (The docstring's exactness argument —
    x*1000 exact in double, no representable round-half ties — is what this
    asserts empirically.)"""
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        lsh_table_buckets_df,
        lsh_table_buckets_pd_df,
    )

    e = load_table(spark, sf_dir, "embeddings")
    expr_form = {(r.vec_id, r.tbl): r.bucket
                 for r in lsh_table_buckets_df(e, "vec_id", "embedding").collect()}
    arrow_form = {(r.vec_id, r.tbl): r.bucket
                  for r in lsh_table_buckets_pd_df(e, "vec_id", "embedding").collect()}
    assert expr_form == arrow_form


def test_dot_product_arrow_form_is_bit_identical(spark, sf_dir):
    """dot_pd_col accumulates dimension-by-dimension (vectorized across
    rows), reproducing dot_col's sequential-fold IEEE operation order —
    the doubles must be BIT-identical (no rounding tolerance) or the
    rounded-to-4dp gate values could flip at a boundary."""
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        dot_col,
        dot_pd_col,
    )

    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_a") == (F.col("id_b") + 7) % 500)
    rows = pairs.select(
        "id_a", "id_b",
        dot_col(F.col("ea"), F.col("eb")).alias("jvm"),
        dot_pd_col(F.col("ea"), F.col("eb")).alias("arrow")).collect()
    assert rows
    for r in rows:
        assert r.jvm == r.arrow  # exact float64 equality


def test_simhash_forms_agree_on_null_and_empty(spark):
    """simhash_df must match simhash_col on the degenerate inputs too:
    NULL text (col form yields 0) and token-less text (all bits set) —
    previously NULL-text docs vanished from simhash_df entirely."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_col,
        simhash_df,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "!!! ???"), (4, "")],
        "doc_id long, text string")
    col_form = {r.doc_id: r.s for r in
                df.select("doc_id", simhash_col(F.col("text")).alias("s")).collect()}
    df_form = {r.doc_id: r.simhash for r in
               simhash_df(df, "doc_id", "text").collect()}
    assert set(df_form) == {1, 2, 3, 4}           # nobody vanishes
    assert df_form == col_form                     # bit-identical forms
    assert df_form[2] == 0                         # NULL text
    assert df_form[3] == 2 ** SIMHASH_BITS - 1     # tokenless text


def test_simhash_oracle_parity_on_degenerate_docs(spark):
    """The DuckDB oracle must agree with simhash_df on the inputs that
    previously drifted silently: a punctuation-only (zero-token) doc, where
    DuckDB's list_sum([]) is NULL and only COALESCE pins both engines to
    all-bits-set, and a NULL-text doc (both emit 0)."""
    import duckdb

    from databricks_import_pyspark_scripts_spark.querylib.dedup import _simhash_oracle

    rows = [(1, "hello world hello again"), (2, None), (3, "!!! ???"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_df(df, "doc_id", "text").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {int(a): int(b) for a, b in con.execute(_simhash_oracle()).fetchall()}
    assert got == want


def test_simhash_band_candidates_stay_linear(spark):
    """15-bit bands (32768 values) must keep the LSH candidate join within a
    small multiple of corpus size. The old 4-bit bands had 16 possible
    values, so ~4n^2/32 pairs collided (~45k on this corpus). With 2^15
    band values collisions drop ~2000x per band; what remains (~6.5n here)
    is the corpus's real near-dup structure: the synthetic docs share
    template vocabulary, so simhash bits are correlated and similar docs
    legitimately co-bucket — that is the recall the banding exists to
    provide, and the verify step prunes it with exact hamming."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        simhash_bands_df,
    )
    from pyspark.sql import functions as F

    d = (load_table(spark, "/root/testdata/sf0.01", "documents")
         .select("doc_id", "text"))
    mutated = (d.filter(F.col("doc_id") % 5 == 0)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" qq")).alias("text")))
    corpus = d.unionByName(mutated)
    n_docs = corpus.count()
    bands = simhash_bands_df(simhash_df(corpus, "doc_id", "text")).persist()
    a, b = bands.alias("a"), bands.alias("b")
    n_cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                     & (F.col("a.band") == F.col("b.band"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .select(F.col("a.doc_id"), F.col("b.doc_id"))
              .distinct().count())
    # old 4-bit-band scheme: ~45_000 on this corpus; 15-bit bands: ~3_900
    assert n_cand <= 15 * n_docs


def test_minhash_arrow_form_agrees(spark, sf_dir):
    """The Arrow minhash fast path must produce bit-identical signatures to
    the exploded md5/conv aggregation on the real documents table — both
    feed band hashes that the DuckDB oracle value-matches."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_pd,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expr_form = {r.doc_id: tuple(r)[1:] for r in
                 minhash_signatures(d, "doc_id", "text").collect()}
    arrow_form = {r.doc_id: tuple(r)[1:] for r in
                  minhash_signatures_pd(d, "doc_id", "text").collect()}
    assert expr_form == arrow_form


def test_minhash_arrow_form_agrees_on_short_docs(spark):
    """Degenerate inputs: fewer tokens than the shingle width k (single
    joined shingle), empty text (md5 of ""), NULL text (both forms keep the
    row with all-NULL signatures: the exploded form's lone NULL shingle
    flows md5(NULL) -> NULL minima)."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_pd,
    )

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None), (4, "a b c d e f"),
         (5, "dup dup dup dup")],
        "doc_id long, text string")
    expr_form = {r.doc_id: tuple(r)[1:] for r in
                 minhash_signatures(df, "doc_id", "text").collect()}
    arrow_form = {r.doc_id: tuple(r)[1:] for r in
                  minhash_signatures_pd(df, "doc_id", "text").collect()}
    assert set(expr_form) == {1, 2, 3, 4, 5}
    assert expr_form[3] == (None,) * 16     # NULL text -> NULL sigs
    assert expr_form == arrow_form


def test_shingle_arrow_form_agrees_as_sets(spark, sf_dir):
    """shingles_pd_df must produce the same shingle SETS as shingles_col on
    the real documents table (order may differ; all consumers — Jaccard
    intersect/union sizes, minhash minima — are order-insensitive)."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        shingles_pd_df,
    )
    from databricks_import_pyspark_scripts_spark.operators.text import (
        shingles_col,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expr_form = {r.doc_id: frozenset(r.sh) for r in
                 d.select("doc_id",
                          shingles_col(F.col("text")).alias("sh")).collect()}
    arrow_form = {r.doc_id: frozenset(r.sh) for r in
                  shingles_pd_df(d, "doc_id", "text").collect()}
    assert expr_form == arrow_form


def test_lsh_table_buckets_pd_preserves_id_type(spark):
    """The mapInPandas output schema derives the id field's type from the
    input: string doc ids must survive (a hardcoded `long` failed or
    silently coerced them at Arrow conversion)."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        lsh_table_buckets_df,
        lsh_table_buckets_pd_df,
    )

    vecs = spark.createDataFrame(
        [("doc-a", [0.1] * 64), ("doc-b", [-0.2] * 64)],
        "vec_id string, embedding array<float>")
    out = lsh_table_buckets_pd_df(vecs, "vec_id", "embedding")
    assert dict(out.dtypes)["vec_id"] == "string"
    got = {(r.vec_id, r.tbl): r.bucket for r in out.collect()}
    # byte-identical buckets vs the expression form on the same string-id df
    want = {(r.vec_id, r.tbl): r.bucket
            for r in lsh_table_buckets_df(vecs, "vec_id", "embedding").collect()}
    assert got == want and len(got) == 32


def test_simhash_arrow_form_agrees(spark, sf_dir):
    """The Arrow (Counter + bit-matrix matmul) simhash must be bit-identical
    to the codegen'd explode form on the real documents table, including the
    degenerate rows (zero-token -> all bits set, NULL text -> 0) — both feed
    queries that share one DuckDB oracle."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        simhash_pd_df,
    )

    d = load_table(spark, sf_dir, "documents")
    bulk = {r.doc_id: r.simhash for r in simhash_df(d, "doc_id", "text").collect()}
    arrow = {r.doc_id: r.simhash
             for r in simhash_pd_df(d, "doc_id", "text").collect()}
    assert arrow == bulk

    edge = spark.createDataFrame(
        [(1, "!!!"), (2, None), (3, "one token alpha")],
        "doc_id long, text string")
    got = {r.doc_id: r.simhash
           for r in simhash_pd_df(edge, "doc_id", "text").collect()}
    want = {r.doc_id: r.simhash
            for r in simhash_df(edge, "doc_id", "text").collect()}
    assert got == want
    assert got[1] == 2 ** 60 - 1 and got[2] == 0


def test_pair_verify_strategies_bit_identical(spark, sf_dir):
    """pair_cosines' broadcast and melt strategies must return bit-identical
    cosines for the same candidate set: both end in the same Arrow fold
    (dot_pd_col) over the same (va, vb) doubles — only the join topology
    differs (corpus broadcast into the pair stream vs melt-join pair
    reassembly). A divergence means one path reordered the reduction."""
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        pair_cosines,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(200)
    ids = e.select(F.col("vec_id").alias("id_a"))
    cand = (ids.join(e.select(F.col("vec_id").alias("id_b")),
                     F.col("id_a") < F.col("id_b"))
            .filter((F.col("id_a") + F.col("id_b")) % 17 == 0))  # ~6% sample
    bcast = {(r.id_a, r.id_b): r.cosine
             for r in pair_cosines(cand, e, strategy="broadcast").collect()}
    melt = {(r.id_a, r.id_b): r.cosine
            for r in pair_cosines(cand, e, strategy="melt").collect()}
    assert bcast == melt
    assert len(bcast) > 100


def test_pair_verify_unknown_strategy_raises(spark, sf_dir):
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        pair_cosines,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cand = e.select(F.col("vec_id").alias("id_a"),
                    F.col("vec_id").alias("id_b"))
    with pytest.raises(ValueError, match="strategy"):
        pair_cosines(cand, e, strategy="banana")


def test_pair_verify_auto_strategy_picks_by_size(spark, sf_dir):
    """auto must resolve to broadcast for a small vector table and to melt
    when the cap forces it — discriminated by plan shape (the melt path
    reassembles pairs via max_by aggregation; the broadcast path has
    none)."""
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        pair_cosines,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cand = (e.select(F.col("vec_id").alias("id_a"))
            .join(e.select(F.col("vec_id").alias("id_b")),
                  F.col("id_a") + 1 == F.col("id_b")))
    small = pair_cosines(cand, e, strategy="auto")
    forced = pair_cosines(cand, e, strategy="auto", broadcast_cap_bytes=1)
    plan_small = small._jdf.queryExecution().optimizedPlan().toString()
    plan_forced = forced._jdf.queryExecution().optimizedPlan().toString()
    assert "max_by" not in plan_small      # broadcast shape
    assert "max_by" in plan_forced         # melt shape
    # and both still compute the same cosines
    a = {(r.id_a, r.id_b): r.cosine for r in small.collect()}
    b = {(r.id_a, r.id_b): r.cosine for r in forced.collect()}
    assert a == b and len(a) > 100


def test_passage_hash_arrow_form_agrees(spark, sf_dir):
    """The Arrow passage-hash projection must produce the exact (id, h)
    MULTISET the expression form produces (positions/duplicates kept —
    these are non-distinct windows), including the short-doc whole-text
    convention. Hash parity = Python hashlib.md5 over UTF-8 vs JVM md5."""
    from collections import Counter

    from databricks_import_pyspark_scripts_spark.operators.search import (
        passage_hashes_pd_df,
        passage_windows_col,
    )

    d = load_table(spark, sf_dir, "documents").limit(150)
    edge = spark.createDataFrame(
        [(9001, "short doc"), (9002, ""), (9003, "a b c d e f g h i j k l m")],
        "doc_id long, text string")
    d = d.select("doc_id", "text").unionByName(edge)
    expr = Counter((r.doc_id, r.h) for r in d.select(
        "doc_id",
        F.explode(passage_windows_col(F.col("text"), 12)).alias("win"))
        .select("doc_id", F.md5("win").alias("h")).collect())
    arrow = Counter((r.doc_id, r.h) for r in
                    passage_hashes_pd_df(d, "doc_id", "text", 12).collect())
    assert expr == arrow


def test_shingle_and_passage_twins_agree_on_adversarial_unicode(spark):
    """Python str.lower() and JVM lower() use different case-folding tables
    in principle (Turkish dotted-I, German eszett, Greek final sigma,
    full-width forms) — if they ever diverge on a character class the
    token regex keeps, every Arrow twin silently forks from its expression
    form AND the DuckDB oracle. Pin the corpus-of-horrors now so a
    locale/regex change fails loudly instead of as a value-hash mystery."""
    from collections import Counter

    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        shingles_pd_df,
    )
    from databricks_import_pyspark_scripts_spark.operators.search import (
        passage_hashes_pd_df,
        passage_windows_col,
    )
    from databricks_import_pyspark_scripts_spark.operators.text import (
        shingles_col,
    )

    rows = [
        (1, "İstanbul I İ ı ÅBC straße STRASSE"),
        (2, "ẞ ß SS ss"),
        (3, "ＡＢＣ １２３ abc123"),
        (4, "étude eétude café"),
        (5, "ΣΙΣΥΦΟΣ σίσυφος"),
        (6, "aaaaa BBBBB emoji 😀 mixed7 tokens8 here9 ten10 "
            "eleven11 twelve12 thirteen13"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    expr_sh = {r.doc_id: sorted(r.sh) for r in d.select(
        "doc_id", shingles_col(F.col("text"), 3).alias("sh")).collect()}
    arrow_sh = {r.doc_id: sorted(r.sh)
                for r in shingles_pd_df(d, "doc_id", "text", 3).collect()}
    assert expr_sh == arrow_sh
    expr_p = Counter((r.doc_id, r.h) for r in d.select(
        "doc_id", F.explode(passage_windows_col(F.col("text"), 12)).alias("w"))
        .select("doc_id", F.md5("w").alias("h")).collect())
    arr_p = Counter((r.doc_id, r.h) for r in
                    passage_hashes_pd_df(d, "doc_id", "text", 12).collect())
    assert expr_p == arr_p


def test_null_text_conventions(spark):
    """NULL-text behavior is a documented three-way divergence kept
    VISIBLE: the expression forms produce [null]-artifact arrays (size 1 /
    one null-hash window — Catalyst null propagation, not semantics), the
    DuckDB oracle produces NULL, and the Arrow forms treat a null text as
    having zero shingles/windows. No gate corpus contains null texts
    (corpus-prep quality gates drop them first); this pin exists so any
    future change to one side fails loudly instead of becoming a latent
    cross-engine mismatch on a corpus with nulls."""
    from databricks_import_pyspark_scripts_spark.operators.search import (
        passage_hashes_pd_df,
        passage_windows_col,
    )
    from databricks_import_pyspark_scripts_spark.operators.text import (
        distinct_shingle_count_pd_col,
        shingles_col,
    )

    d = spark.createDataFrame([(1, None), (2, "a b c d e")],
                              "doc_id long, text string")
    # expression artifact: [null] -> size 1
    expr = {r.doc_id: r.c for r in d.select(
        "doc_id", F.size(shingles_col(F.col("text"), 3)).alias("c")).collect()}
    assert expr == {1: 1, 2: 3}
    # Arrow convention: zero shingles for null text
    arrow = {r.doc_id: r.c for r in d.select(
        "doc_id",
        distinct_shingle_count_pd_col(F.col("text"), 3).alias("c")).collect()}
    assert arrow == {1: 0, 2: 3}
    # expression passages: one null-hash window for the null doc
    expr_p = {r.doc_id for r in d.select(
        "doc_id",
        F.explode(passage_windows_col(F.col("text"), 3)).alias("w")).collect()}
    assert expr_p == {1, 2}
    # Arrow passages: null doc absent
    arr_p = {r.doc_id for r in
             passage_hashes_pd_df(d, "doc_id", "text", 3).collect()}
    assert arr_p == {2}


def test_pq_encode_arrow_form_matches_expression(spark, sf_dir):
    """pq_encode_pd (Arrow GEMM encode, r14) must emit the IDENTICAL
    (id, m, code) set as the expression form on the real embeddings
    table: distances are exact int64 in both, and np.argmin's
    first-minimum over ascending-j codewords is the expression form's
    (distance, j) min-struct tie-break."""
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
        pq_encode_pd,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding")
    expr_form = {(r.vec_id, r.m): r.code for r in
                 pq_encode(emb, cb, "vec_id", "embedding").collect()}
    arrow_form = {(r.vec_id, r.m): r.code for r in
                  pq_encode_pd(emb, cb, "vec_id", "embedding").collect()}
    assert expr_form == arrow_form


def test_fused_shingle_sig_matches_separate(spark, sf_dir):
    """shingle_sig_pd_df (r14 batch 12: one tokenize pass emitting BOTH
    shingle arrays and minhash signatures) must agree with the separate
    shingles_pd_df / minhash_signatures_pd passes on the real documents
    table — same shingle SETS (order is free, consumers are
    order-insensitive) and bit-identical signature columns. NULL-text
    convention matches both parents: NULL sh, NULL signatures."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        minhash_signatures_pd,
        shingle_sig_pd_df,
        shingles_pd_df,
    )

    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", "text").limit(300))
    fused = shingle_sig_pd_df(d, "doc_id", "text").collect()
    sep_sh = {r.doc_id: r.sh for r in
              shingles_pd_df(d, "doc_id", "text").collect()}
    sep_sig = {r.doc_id: tuple(r[f"sig{j}"] for j in range(16)) for r in
               minhash_signatures_pd(d, "doc_id", "text").collect()}
    assert len(fused) == len(sep_sh)
    for r in fused:
        a, b = r.sh, sep_sh[r.doc_id]
        assert (a is None and b is None) or set(a) == set(b)
        assert tuple(r[f"sig{j}"] for j in range(16)) == sep_sig[r.doc_id]

    null_df = spark.createDataFrame([(1, None), (2, "a b c d")],
                                    "doc_id long, text string")
    rows = {r.doc_id: r for r in
            shingle_sig_pd_df(null_df, "doc_id", "text").collect()}
    assert rows[1].sh is None and rows[1].sig0 is None
    assert rows[2].sh is not None and rows[2].sig0 is not None
