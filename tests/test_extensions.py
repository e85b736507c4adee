"""Unit tests for the LLM-pipeline extension operators on crafted inputs
(the querylib oracle checks cover the testdata-scale behavior)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.dedup import (
    exact_dedup,
    jaccard_col,
    minhash_lsh_pairs,
    simhash_col,
)
from databricks_import_pyspark_scripts_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_col,
    lsh_topk,
)
from databricks_import_pyspark_scripts_spark.operators.text import (
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    shingles_col,
    token_count_col,
)


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(shingles_col(F.col("text")).alias("sh")).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == ["a b"]  # shorter than k -> whole text as one shingle


def test_token_count_and_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("hello   world",)], "text string")
    out = df.select(token_count_col(F.col("text")).alias("n"),
                    fingerprint_col(F.col("text")).alias("fp")).collect()
    assert out[0].n == out[1].n == 2
    assert out[0].fp == out[1].fp  # punctuation/whitespace-insensitive


def test_exact_dedup_deterministic_representative(spark):
    df = spark.createDataFrame(
        [(10, "x"), (3, "x"), (7, "y")], "doc_id long, k string")
    got = {r.k: (r.doc_id, r.n_copies)
           for r in exact_dedup(df, ["k"], "doc_id").collect()}
    assert got == {"x": (3, 2), "y": (7, 1)}


def test_jaccard(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])],
                               "a array<string>, b array<string>")
    val = df.select(jaccard_col(F.col("a"), F.col("b")).alias("j")).collect()[0].j
    assert val == pytest.approx(2 / 4)


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        (1, base),
        (2, base + " ok"),            # near-dup of 1
        (3, "completely different content about spark query engines at scale"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in
             minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_close_for_near_dups(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta eta"),
         (3, "totally unrelated words here now")],
        "doc_id long, text string")
    out = {r.doc_id: r.s for r in
           df.select("doc_id", simhash_col(F.col("text")).alias("s")).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_lang_id(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and it is happy",),
         ("el perro es grande y la casa es bonita",),
         ("zzz qqq xxx",)], "text string")
    got = [r.l for r in df.select(lang_id_col(F.col("text")).alias("l")).collect()]
    assert got == ["en", "es", "und"]


def test_quality_score_range(spark, sf_dir):
    from databricks_import_pyspark_scripts_spark.sources.registry import load_table
    d = load_table(spark, sf_dir, "documents")
    stats = d.select(quality_score_col(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def _vec_df(spark, rows, id_name):
    return spark.createDataFrame(rows, f"{id_name} long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    vecs = _vec_df(spark, [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id")
    qs = spark.createDataFrame([(1, [1.0, 0.0])], "query_id long, q_embedding array<float>")
    got = [(r.vec_id, r.rank) for r in
           brute_force_topk(vecs, qs, k=2).orderBy("rank").collect()]
    assert got == [(2, 1), (3, 2)]  # 2 is nearest; self (1) excluded


def test_lsh_bucket_deterministic_and_groups_similar(spark):
    vecs = _vec_df(spark, [
        (1, [1.0] * 64), (2, [0.99] * 64), (3, [-1.0] * 64)], "vec_id")
    out = {r.vec_id: r.b for r in
           vecs.select("vec_id", lsh_bucket_col(F.col("embedding")).alias("b")).collect()}
    assert out[1] == out[2]          # near-identical vectors share a bucket
    assert out[1] != out[3]          # opposite vector lands elsewhere


def test_lsh_topk_subset_of_bucket(spark):
    vecs = _vec_df(spark, [(i, [float(i % 7), 1.0] * 32) for i in range(1, 40)], "vec_id")
    qs = (vecs.filter(F.col("vec_id") == 1)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_embedding")))
    got = lsh_topk(vecs, qs, k=3).collect()
    assert 0 < len(got) <= 3
    assert all(r.query_id == 1 and r.vec_id != 1 for r in got)


def test_ann_recall_floor(spark):
    """Recall regression gate for the ANN paths on the sf0.01 embeddings:
    multi-table LSH and IVF must both recover >= 60% of the exact top-10,
    and multi-table LSH must dominate the single-table form (whose 8-plane
    AND-only bucket measured recall 0.005 — the motivating bug)."""
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        ivf_topk,
        lsh_multi_topk,
    )
    from databricks_import_pyspark_scripts_spark.sources.registry import load_table

    vectors = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = (vectors.filter(F.col("vec_id") % 25 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    k = 10

    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    truth = pairs(brute_force_topk(vectors, queries, k))
    multi = pairs(lsh_multi_topk(vectors, queries, k))
    ivf = pairs(ivf_topk(vectors, queries, k))
    single = pairs(lsh_topk(vectors, queries, k))
    recall = lambda got: len(truth & got) / len(truth)  # noqa: E731
    assert recall(multi) >= 0.6       # measured 0.71 (L=16, b=5)
    assert recall(ivf) >= 0.6         # nprobe=2; sf0.01 has 2 cells -> 1.0
    assert recall(multi) > recall(single) + 0.3


def test_embedding_dedup_pair_recall_floor(spark):
    """The multi-table-LSH near-dup pair query must recover >= 60% of the
    exact cosine>=0.3 pairs (the single-bucket form measured 1.1%)."""
    from databricks_import_pyspark_scripts_spark.querylib import all_queries
    from databricks_import_pyspark_scripts_spark.operators.similarity import dot_col
    from databricks_import_pyspark_scripts_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.01"
    got = {(r.id_a, r.id_b)
           for r in all_queries()["dedup_embedding_cosine"](spark, sf).collect()}
    emb = load_table(spark, sf, "embeddings")
    v = emb.withColumn("n2", dot_col(F.col("embedding"), F.col("embedding")))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
                 F.col("n2").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
                 F.col("n2").alias("nb"))
    from databricks_import_pyspark_scripts_spark.operators.similarity import _pair_cosine
    exact = {(r.id_a, r.id_b) for r in
             a.join(b, F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     _pair_cosine(F.col("ea"), F.col("eb"),
                                  F.col("na"), F.col("nb")).alias("c"))
             .filter(F.col("c") >= 0.3).collect()}
    assert len(exact) > 0
    assert len(got & exact) / len(exact) >= 0.6   # measured 0.777


def test_sampling_deterministic_with_seed(spark, sf_dir):
    """sample()/sampleBy() with a fixed seed: identical row sets across
    runs and plans (the reproducible-subset requirement of a training
    pipeline), and fraction within binomial tolerance. NB: Spark seeds are
    NOT portable to other engines — cross-engine reproducible splits use
    split_bucket_col (md5) instead; these APIs are for within-Spark
    subsampling.

    Footgun (probed): ``df.sample(0.2, seed=7)`` — fraction positional —
    silently DROPS the seed (PySpark's withReplacement/fraction arg
    juggling) and every call draws a fresh random seed. Always pass
    ``fraction=`` by keyword."""
    from databricks_import_pyspark_scripts_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    s1 = {r.o_orderkey for r in o.sample(fraction=0.2, seed=7)
          .select("o_orderkey").collect()}
    s2 = {r.o_orderkey for r in load_table(spark, sf_dir, "orders")
          .sample(fraction=0.2, seed=7).select("o_orderkey").collect()}
    assert s1 == s2                       # same seed -> same subset
    assert abs(len(s1) / n - 0.2) < 0.05  # fraction within tolerance

    strata = (o.sampleBy("o_orderstatus", {"O": 0.5, "F": 0.1, "P": 1.0}, seed=7)
              .groupBy("o_orderstatus").count().collect())
    by = {r.o_orderstatus: r["count"] for r in strata}
    totals = {r.o_orderstatus: r["count"]
              for r in o.groupBy("o_orderstatus").count().collect()}
    assert abs(by["O"] / totals["O"] - 0.5) < 0.08
    assert abs(by["F"] / totals["F"] - 0.1) < 0.08
    assert by["P"] == totals["P"]         # fraction 1.0 keeps every row


def test_kmeans_centroids_improve_ivf_recall(spark):
    """VERDICT r1 #8: the pyspark.ml KMeans-trained IVF quantizer (public
    API, offline step at scale) must beat the deterministic every-Nth
    stand-in at EQUAL cell count — measured 0.450 vs 0.360 recall@10 with
    16 cells, nprobe=2, on the 500-vector sf0.01 near-random synthetic
    corpus (fixed: the sf0.001 corpus is too small for 16 cells to carry
    signal). Both run the identical search path; deterministic seeds keep
    this stable."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from databricks_import_pyspark_scripts_spark.sources.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    n = emb.count()
    queries = (emb.filter(F.col("vec_id") % 50 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    truth = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, queries, k=10).collect()}

    def recall(df):
        got = {(r.query_id, r.vec_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    standin = recall(ivf_topk(emb, queries, k=10,
                              centroid_mod=max(1, n // 16), nprobe=2))
    trained = recall(ivf_topk(emb, queries, k=10, nprobe=2,
                              centroids=kmeans_centroids(emb, 16)))
    assert trained > standin
    assert trained >= 0.40


def test_lsh_queries_leave_no_pinned_caches(spark, sf_dir):
    """Round-2 task #4: the LSH pair generators used to persist their band
    tables (CORPUS-scale) and never release them — in a long-lived session
    those pins accumulated without bound. The bucket-grouped pair-explode
    shape computes bands exactly once with nothing corpus-scale persisted.

    r14 amendment: ``minhash_lsh_pairs`` now eagerly localCheckpoints its
    candidate PAIR list (LSH-bounded metadata, not the corpus) because the
    list has two consumers — the melt verify and the candidate-id semi-join
    that keeps verify tokenization O(candidates). The hygiene contract is
    therefore scoped reclaimability, not zero checkpoints: every pin a
    query creates must be released by ``checkpoint_scope`` (the documented
    production wrapper; bench.py likewise unpersists leftovers between
    queries), so a long-lived session stays storage-clean."""
    from databricks_import_pyspark_scripts_spark.operators.lineage import (
        checkpoint_scope,
    )
    from databricks_import_pyspark_scripts_spark.querylib import all_queries

    qs = all_queries()

    def pinned_ids() -> set:
        it = (spark.sparkContext._jsc.sc()  # noqa: SLF001
              .getPersistentRDDs().keysIterator())
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    # id-set delta, not a count compare: other tests' localCheckpoint RDDs
    # (kmeans materialize, incremental near-dup candidates, graph CC) are
    # cleaned ASYNCHRONOUSLY by the ContextCleaner, so the raw count can
    # legitimately DROP mid-test; only NEW ids mean these queries pinned
    # something
    baseline = pinned_ids()
    for name in ("dedup_minhash_lsh", "dedup_simhash_pairs",
                 "dedup_embedding_cosine"):
        with checkpoint_scope(spark):
            qs[name](spark, sf_dir).count()
            added_inside = pinned_ids() - baseline
            # bound: only the deliberate candidate-list checkpoint (plus
            # nothing) may pin — a corpus-scale band-table persist would
            # show up as several block-heavy RDDs per invocation
            assert len(added_inside) <= 1, (
                f"{name} pinned {len(added_inside)} new RDDs inside the "
                f"scope: {added_inside}")
        added = pinned_ids() - baseline
        assert not added, (
            f"{name} left pinned RDDs after checkpoint_scope: {added}")


def test_pack_sequences_prefix_sum_semantics(spark):
    """Packing is by cumulative token OFFSET: a doc straddling the budget
    boundary belongs to the pack its first token falls in, and pack ids are
    contiguous from 0 within each shard."""
    from databricks_import_pyspark_scripts_spark.operators.text import (
        pack_sequences,
    )

    rows = [(i, 0, 600) for i in range(1, 8)]      # 7 docs x 600 tokens
    df = spark.createDataFrame(rows, "doc_id long, shard int, n_tokens long")
    got = {r.doc_id: r.pack_id for r in
           pack_sequences(df, "doc_id", "shard", "n_tokens", 2048).collect()}
    # offsets 0,600,1200,1800,2400,3000,3600 // 2048 -> 0,0,0,0,1,1,1
    assert got == {1: 0, 2: 0, 3: 0, 4: 0, 5: 1, 6: 1, 7: 1}

    two_shards = spark.createDataFrame(
        [(1, 0, 2048), (2, 0, 1), (3, 1, 2047), (4, 1, 1), (5, 1, 1)],
        "doc_id long, shard int, n_tokens long")
    got2 = {r.doc_id: r.pack_id for r in
            pack_sequences(two_shards, "doc_id", "shard", "n_tokens",
                           2048).collect()}
    # shard 0: offsets 0, 2048 -> packs 0, 1; shard 1: 0, 2047, 2048 -> 0, 0, 1
    assert got2 == {1: 0, 2: 1, 3: 0, 4: 0, 5: 1}


def test_cms_heavy_hitters_bounded_candidates_high_cardinality(spark):
    """The CMS probe must stay bounded on a high-cardinality key: the
    freqItems pre-pass collects at most ~1/threshold candidates (not the
    distinct key set), yet every truly-heavy key is still flagged and
    non-candidate keys coalesce to not-heavy."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.querylib.advanced import (
        cms_heavy_hitters,
    )

    # one heavy key (50%) + 5000 distinct long-tail keys
    df = (spark.range(10_000)
          .select(F.when(F.col("id") < 5_000, F.lit("heavy"))
                  .otherwise(F.concat(F.lit("k"), (F.col("id") % 5_000)
                                      .cast("string"))).alias("k")))
    out = cms_heavy_hitters(df, "k", frac_threshold=0.4)
    heavy = {r.k for r in out.filter("is_heavy").collect()}
    assert heavy == {"heavy"}
    assert out.count() == 5_001  # every key still present in the output
    # explicit candidate list path: bounded by the caller
    out2 = cms_heavy_hitters(df, "k", frac_threshold=0.4,
                             candidates=["heavy", "k7"])
    got = {r.k: r.is_heavy for r in out2.collect()}
    assert got["heavy"] is True and got["k7"] is False and len(got) == 5_001


def test_chunking_invariants_cover_all_tokens(spark):
    """Chunk geometry invariants over every length 0..250: chunk count
    matches max(1, ceil((n-overlap)/stride)), consecutive full windows
    overlap by exactly CHUNK_OVERLAP, and re-assembling stride prefixes
    plus the last chunk reproduces the whole token sequence (no token is
    lost at a boundary)."""
    import math

    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.querylib.text import (
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    docs = [(n, " ".join(f"t{i}" for i in range(n))) for n in range(0, 251)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = F.regexp_extract_all(F.lower(F.col("text")),
                                F.lit("[a-z0-9]+"), 0)
    sized = (df.select("doc_id", toks.alias("tk"))
             .withColumn("n", F.size("tk")))
    n_chunks = F.greatest(
        F.ceil((F.col("n") - CHUNK_OVERLAP) / F.lit(float(CHUNK_STRIDE)))
         .cast("long"), F.lit(1).cast("long"))
    rows = (sized.select(
        "doc_id", "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
         .alias("ci"),
        F.slice(F.col("tk"), (F.col("ci") * CHUNK_STRIDE + 1).cast("int"),
                CHUNK_TOKENS).alias("chunk"))
        .collect())
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.ci)
        want = max(1, math.ceil((n - CHUNK_OVERLAP) / CHUNK_STRIDE))
        assert len(chunks) == want, (n, len(chunks), want)
        # stride prefixes + final chunk reassemble the doc exactly
        rebuilt = []
        for r in chunks[:-1]:
            rebuilt.extend(r.chunk[:CHUNK_STRIDE])
        rebuilt.extend(chunks[-1].chunk)
        assert rebuilt == [f"t{i}" for i in range(n)], n
        # consecutive full windows overlap by exactly CHUNK_OVERLAP
        for a, b in zip(chunks, chunks[1:]):
            if len(a.chunk) == CHUNK_TOKENS:
                assert a.chunk[CHUNK_STRIDE:] == b.chunk[:CHUNK_OVERLAP], n


def test_boilerplate_flags_template_docs(spark):
    from databricks_import_pyspark_scripts_spark.operators.text import (
        boilerplate_ngram_stats,
    )

    # 6 docs share a template prefix; 2 are fully distinct text
    tmpl = "click here to subscribe to our newsletter today"
    rows = [(i, f"{tmpl} unique body {i} alpha beta") for i in range(6)]
    rows += [(10, "entirely different prose about rivers and stones"),
             (11, "another unrelated passage with fresh vocabulary")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 8 docs, relative threshold 63% -> frequent means >= ceil(8*0.63) = 6
    # docs, exactly the 6 template copies
    out = boilerplate_ngram_stats(df, "doc_id", "text", n=3, min_df_pct=63,
                                  flag_frac=0.3)
    got = {r.doc_id: r for r in out.collect()}
    assert all(got[i].is_boilerplate for i in range(6))
    assert not got[10].is_boilerplate and not got[11].is_boilerplate
    # counts are exact: template contributes 6 shared 3-grams per doc
    assert got[0].n_boiler >= 6
    assert got[10].n_boiler == 0


def test_mixture_budget_keep_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.text import (
        mixture_budget_keep,
    )

    # two sources, equal token mass; weights 80/20 with budget=1/2 of
    # tokens -> target keep rates 0.8 and 0.2
    rows = [(i, "a" if i % 2 == 0 else "b", 10) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    w = F.when(F.col("source") == "a", F.lit(80)).otherwise(F.lit(20))
    kept = mixture_budget_keep(df, "doc_id", "source", "n_tok", w,
                               budget_num=1, budget_den=2)
    sizes = {r.source: r.n for r in
             kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # md5 buckets are uniform: expect ~800 and ~200 of 1000 each, loose bounds
    assert 700 <= sizes["a"] <= 900, sizes
    assert 140 <= sizes["b"] <= 260, sizes
    again = mixture_budget_keep(df, "doc_id", "source", "n_tok", w,
                                budget_num=1, budget_den=2)
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, again.collect()))


def test_mixture_rate_caps_at_one(spark):
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.text import (
        mixture_budget_keep,
    )

    # a tiny source with a huge weight: implied rate > 1 must keep ALL of it
    rows = [(i, "big", 10) for i in range(1000)] + [(5000 + i, "tiny", 10)
                                                    for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    w = F.when(F.col("source") == "tiny", F.lit(90)).otherwise(F.lit(10))
    kept = mixture_budget_keep(df, "doc_id", "source", "n_tok", w,
                               budget_num=1, budget_den=2)
    assert kept.filter(F.col("source") == "tiny").count() == 5


def test_self_repetition_counts(spark):
    from databricks_import_pyspark_scripts_spark.operators.text import (
        self_repetition_stats,
    )

    rows = [(1, "a b c a b c a b c"),   # 7 total 3-grams, 3 distinct
            (2, "one two three four"),  # 2 total, 2 distinct
            (3, "x y")]                 # short text: 1 whole-text shingle
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           self_repetition_stats(df, "doc_id", "text").collect()}
    assert (got[1].n_ngrams_total, got[1].n_ngrams_distinct) == (7, 3)
    assert got[1].self_rep_frac == round(1 - 3 / 7, 4)
    assert got[2].self_rep_frac == 0.0
    assert (got[3].n_ngrams_total, got[3].n_ngrams_distinct) == (1, 1)


def test_pq_encode_and_adc_recall(spark, sf_dir):
    import pyspark.sql.functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        brute_force_topk,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebook(emb, "vec_id", "embedding")
    assert cb.count() == PQ_M * PQ_K
    codes = pq_encode(emb, cb, "vec_id", "embedding")
    n = emb.count()
    # every vector gets exactly one code per subspace, codes in range
    assert codes.count() == n * PQ_M
    rng = codes.agg(F.min("code"), F.max("code")).first()
    assert rng[0] >= 0 and rng[1] < PQ_K
    # a codebook seed vector reconstructs itself exactly: vec j's subspace
    # codes must all be j (distance 0 to its own codeword)
    own = codes.filter(F.col("vec_id") == 3).select("code").collect()
    assert all(r.code == 3 for r in own)
    # ADC is an approximation; require real recall against the exact top-k
    q = (emb.filter(F.col("vec_id") % 10 == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_embedding")))
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in pq_adc_topk(emb, q, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    # near-random synthetic embeddings are the hardest ANN case; this
    # measures 0.168 at sf0.001 and 0.216 at sf0.01 (vs 0.02 random at
    # sf0.01), fully deterministic — the floor just pins it from regressing
    assert recall >= 0.15, recall


def test_ivf_pq_is_subset_scoring_of_pq(spark, sf_dir):
    import pyspark.sql.functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") % 10 == 0)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_embedding")))
    full = {(r.query_id, r.vec_id): r.adc_dist
            for r in pq_adc_topk(emb, q, k=10 ** 6, m=8).collect()}
    pruned = ivf_pq_topk(emb, q, k=5, centroid_mod=10, nprobe=2).collect()
    assert len(pruned) > 0
    # every IVF-PQ result must carry the exact same ADC distance the
    # unpruned PQ scorer assigns that pair (cells prune, never rescore)
    for r in pruned:
        assert full[(r.query_id, r.vec_id)] == r.adc_dist


def test_parameter_guards_raise(spark):
    import pytest as _pytest

    from databricks_import_pyspark_scripts_spark.operators.clustering import (
        kmeans_assign_arrow,
    )
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        pq_codebook,
    )
    from databricks_import_pyspark_scripts_spark.operators.text import (
        mixture_budget_keep,
    )

    df = spark.createDataFrame([(1, "a", 10)],
                               "doc_id long, source string, n_tok long")
    with _pytest.raises(ValueError, match="multiple of 100"):
        mixture_budget_keep(df, "doc_id", "source", "n_tok",
                            F.lit(50), buckets=50)
    vecs = spark.createDataFrame([(1, [0.0, 0.0])],
                                 "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="no seed centroids"):
        kmeans_assign_arrow(vecs, "vec_id", "embedding", dim=2,
                            centroid_mod=100)
    with _pytest.raises(ValueError, match="not divisible"):
        pq_codebook(vecs, "vec_id", "embedding", dim=60, m=8)


def test_semdedup_keep_earliest_within_cluster(spark):
    """SemDeDup rule: an item is dropped iff a SMALLER-id cluster-mate is
    within eps — the earliest member of each near-group survives, and
    near-identical vectors in DIFFERENT clusters are never compared."""
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        semdedup_flags,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, embedding array<double>")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.01]),    # cluster 0, first of a near-pair -> kept
         (2, [1.0, 0.011]),   # near-dup of 1, larger id -> dropped
         (3, [0.9, 0.5]),     # cluster 0 but far from 1/2 at thr=0.999
         (10, [0.01, 1.0]),   # cluster 1: near-identical to vec 2's
                              # DIRECTION? no — different cluster, and
                              # never compared against cluster 0 members
         (11, [0.011, 1.0])], # near-dup of 10 -> dropped
        "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semdedup_flags(
        vecs, cents, threshold=0.999).collect()}
    assert not out[1].is_dropped and out[2].is_dropped
    assert not out[3].is_dropped          # same cluster, below threshold
    assert not out[10].is_dropped and out[11].is_dropped
    assert out[2].max_sim_smaller >= 0.999
    # cluster assignment sanity: the two groups landed in different cells
    assert out[1].cell != out[10].cell


def test_stratified_sample_exact_quotas(spark):
    """Every stratum keeps EXACTLY floor(n * num/den) rows, including the
    float-trap sizes (0.2*15 floats to 2.999...96): integer cross-multiply
    must keep 3. Determinism: same input -> same ids."""
    from databricks_import_pyspark_scripts_spark.operators.text import (
        stratified_sample_exact,
    )

    rows = []
    sizes = {"a": 15, "b": 4, "c": 5, "d": 1}
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = spark.createDataFrame(rows, "id long, grp string")
    out = stratified_sample_exact(df, ["grp"], 1, 5, "id")
    got = out.groupBy("grp").count().collect()
    counts = {r.grp: r["count"] for r in got}
    # zero-quota strata produce NO output rows (the filter drops them
    # before the groupBy), so only a and c appear
    assert counts == {"a": 3, "c": 1}
    a = sorted(r.id for r in out.collect())
    b = sorted(r.id for r in stratified_sample_exact(
        df, ["grp"], 1, 5, "id").collect())
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="bad keep fraction"):
        stratified_sample_exact(df, ["grp"], 1, 0, "id")


def test_global_shuffle_shards_matches_naive_total_sort(spark):
    """The bucketed two-pass index must be BIT-IDENTICAL to the naive
    one-task ``row_number() OVER (ORDER BY md5)`` sort — same permutation,
    same shards — and shard sizes even to ±1 with every index distinct."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from databricks_import_pyspark_scripts_spark.operators.text import (
        global_shuffle_shards,
    )

    n, shards = 1003, 7  # non-multiple: forces the ±1 size case
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = global_shuffle_shards(df, "doc_id", shards, seed="s1")
    got = {r.doc_id: (r.global_index, r.shard, r.pos_in_shard)
           for r in out.collect()}

    h = F.md5(F.concat(F.lit("s1:"), F.col("doc_id").cast("string")))
    naive = (df.withColumn(
        "gidx",
        F.row_number().over(Window.orderBy(h.asc(), F.col("doc_id").asc()))
        .cast("long") - 1))
    want = {r.doc_id: (r.gidx, r.gidx % shards, r.gidx // shards)
            for r in naive.collect()}
    assert got == want

    sizes = sorted(
        r["count"] for r in out.groupBy("shard").count().collect())
    assert len(sizes) == shards and sizes[-1] - sizes[0] <= 1
    assert sum(sizes) == n
    idxs = sorted(v[0] for v in got.values())
    assert idxs == list(range(n))

    # determinism is partitioning-independent: a different physical layout
    # of the same rows yields the same assignment
    again = global_shuffle_shards(
        df.repartition(13), "doc_id", shards, seed="s1")
    assert {r.doc_id: (r.global_index, r.shard, r.pos_in_shard)
            for r in again.collect()} == want
    # a new seed is a genuinely different permutation
    other = global_shuffle_shards(df, "doc_id", shards, seed="s2")
    assert {r.doc_id: r.global_index
            for r in other.collect()} != {k: v[0] for k, v in got.items()}

    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        global_shuffle_shards(df, "doc_id", 0)


def test_lsh_stored_index_roundtrip(spark, sf_dir, tmp_path):
    """The stored ANN-index path must be real: build the (vec_id, tbl,
    bucket) table, persist partitioned by tbl, reload, and query with it —
    row-identical top-k to the recompute-from-vectors path."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        build_lsh_index,
        lsh_multi_topk,
    )
    from databricks_import_pyspark_scripts_spark.sources.registry import (
        load_table,
    )

    vectors = load_table(spark, sf_dir, "embeddings")
    queries = (vectors.filter(F.col("vec_id") % 50 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    idx_path = str(tmp_path / "lsh_index")
    build_lsh_index(vectors).write.partitionBy("tbl").parquet(idx_path)
    stored = spark.read.parquet(idx_path)
    with_index = {(r.query_id, r.rank): (r.vec_id, r.cosine)
                  for r in lsh_multi_topk(vectors, queries, k=5,
                                          index=stored).collect()}
    recomputed = {(r.query_id, r.rank): (r.vec_id, r.cosine)
                  for r in lsh_multi_topk(vectors, queries, k=5).collect()}
    assert with_index == recomputed
    assert len(with_index) > 0


def test_ivf_stored_assignments_roundtrip(spark, sf_dir, tmp_path):
    """The ingest-time (vec_id, cell) assignment path must be real:
    persist the assignment partitioned by cell, reload, and query with it
    — row-identical top-k to the recompute path."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        CENTROID_MOD,
        ivf_assignments,
        ivf_topk,
    )
    from databricks_import_pyspark_scripts_spark.sources.registry import (
        load_table,
    )

    vectors = load_table(spark, sf_dir, "embeddings")
    queries = (vectors.filter(F.col("vec_id") % 50 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    cents = (vectors.filter(F.col("vec_id") % CENTROID_MOD == 0)
             .select((F.col("vec_id") / CENTROID_MOD).cast("long")
                     .alias("centroid_id"), "embedding"))
    path = str(tmp_path / "ivf_cells")
    ivf_assignments(vectors, cents).write.partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path)
    with_idx = {(r.query_id, r.rank): (r.vec_id, r.cosine)
                for r in ivf_topk(vectors, queries, k=5,
                                  assignments=stored).collect()}
    recomputed = {(r.query_id, r.rank): (r.vec_id, r.cosine)
                  for r in ivf_topk(vectors, queries, k=5).collect()}
    assert with_idx == recomputed
    assert len(with_idx) > 0


def test_pq_stored_codes_roundtrip(spark, sf_dir, tmp_path):
    """The PQ promise is that queries never read raw vectors: persist the
    codebook and code table, reload both, and run the ADC top-k from the
    stored codes — row-identical to the encode-inline path."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )
    from databricks_import_pyspark_scripts_spark.sources.registry import (
        load_table,
    )

    vectors = load_table(spark, sf_dir, "embeddings")
    queries = (vectors.filter(F.col("vec_id") % 50 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    cb = pq_codebook(vectors, "vec_id", "embedding")
    cb_path, codes_path = str(tmp_path / "pq_cb"), str(tmp_path / "pq_codes")
    cb.write.parquet(cb_path)
    pq_encode(vectors, cb, "vec_id", "embedding").write.parquet(codes_path)
    stored_cb = spark.read.parquet(cb_path)
    stored_codes = spark.read.parquet(codes_path)
    with_idx = {(r.query_id, r.rank): (r.vec_id, r.adc_dist)
                for r in pq_adc_topk(vectors, queries, k=5,
                                     codebook=stored_cb,
                                     codes=stored_codes).collect()}
    inline = {(r.query_id, r.rank): (r.vec_id, r.adc_dist)
              for r in pq_adc_topk(vectors, queries, k=5).collect()}
    assert with_idx == inline
    assert len(with_idx) > 0


def test_ivf_pq_stored_layout_roundtrip(spark, sf_dir, tmp_path):
    """The full production ANN layout: persisted cell assignments AND PQ
    codes; a query batch reads no raw corpus vectors. Row-identical to
    the compute-inline composite."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        CENTROID_MOD,
        ivf_assignments,
        ivf_pq_topk,
        pq_codebook,
        pq_encode,
    )
    from databricks_import_pyspark_scripts_spark.sources.registry import (
        load_table,
    )

    vectors = load_table(spark, sf_dir, "embeddings")
    queries = (vectors.filter(F.col("vec_id") % 50 == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    cents = (vectors.filter(F.col("vec_id") % CENTROID_MOD == 0)
             .select((F.col("vec_id") / CENTROID_MOD).cast("long")
                     .alias("centroid_id"), "embedding"))
    cb = pq_codebook(vectors, "vec_id", "embedding")
    cells_p, codes_p, cb_p = (str(tmp_path / n)
                              for n in ("cells", "codes", "cb"))
    ivf_assignments(vectors, cents).write.partitionBy("cell").parquet(cells_p)
    pq_encode(vectors, cb, "vec_id", "embedding").write.parquet(codes_p)
    cb.write.parquet(cb_p)
    with_idx = {(r.query_id, r.rank): (r.vec_id, r.adc_dist)
                for r in ivf_pq_topk(
                    vectors, queries, k=5,
                    codebook=spark.read.parquet(cb_p),
                    assignments=spark.read.parquet(cells_p),
                    codes=spark.read.parquet(codes_p)).collect()}
    inline = {(r.query_id, r.rank): (r.vec_id, r.adc_dist)
              for r in ivf_pq_topk(vectors, queries, k=5).collect()}
    assert with_idx == inline
    assert len(with_idx) > 0


def test_psi_composes_from_stored_rollups(spark, sf_dir):
    """The drift monitor's operational claim: PSI between two periods is
    computable from their STORED (type, bucket) rollups alone — no raw
    corpus access. Build each period's rollup independently (as a stored
    artifact would be), recompute PSI driver-side from those counts, and
    match the gate query."""
    import math

    from databricks_import_pyspark_scripts_spark.querylib.product_analytics import (
        PSI_BUCKETS,
        PSI_SPLIT_TS,
        PSI_WIDTH,
        events_psi_drift,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / PSI_WIDTH).cast("int"), F.lit(0)),
        F.lit(PSI_BUCKETS - 1)).alias("bucket")
    split = F.lit(PSI_SPLIT_TS).cast("timestamp")
    rolls = {}
    for period, pred in (("ref", F.col("ts") < split),
                         ("cur", ~(F.col("ts") < split))):
        rolls[period] = {
            (r.event_type, r.bucket): r.n
            for r in (e.filter(pred).groupBy("event_type", bucket)
                      .agg(F.count(F.lit(1)).alias("n")).collect())}
    types = {t for t, _ in rolls["ref"]} | {t for t, _ in rolls["cur"]}
    direct = {r.event_type: r.psi
              for r in events_psi_drift(spark, sf_dir).collect()}
    assert set(direct) == types
    for t in types:
        tr = sum(rolls["ref"].get((t, b), 0) for b in range(PSI_BUCKETS))
        tc = sum(rolls["cur"].get((t, b), 0) for b in range(PSI_BUCKETS))
        psi = sum(
            ((rolls["ref"].get((t, b), 0) + 1.0) / (tr + PSI_BUCKETS)
             - (rolls["cur"].get((t, b), 0) + 1.0) / (tc + PSI_BUCKETS))
            * math.log(((rolls["ref"].get((t, b), 0) + 1.0)
                        / (tr + PSI_BUCKETS))
                       / ((rolls["cur"].get((t, b), 0) + 1.0)
                          / (tc + PSI_BUCKETS)))
            for b in range(PSI_BUCKETS))
        assert abs(psi - direct[t]) <= 1e-4


def test_ks_drift_matches_scipy_style_recompute(spark, sf_dir):
    """KS gate vs a plain-Python ECDF recompute on the same rows — pins
    the statistic's definition independently of the SQL oracle."""
    from databricks_import_pyspark_scripts_spark.querylib.product_analytics import (
        PSI_SPLIT_TS,
        events_ks_drift,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = e.select("event_type", "ts", "value").collect()
    import datetime

    split = datetime.datetime.fromisoformat(PSI_SPLIT_TS)
    got = {r.event_type: (r.n_ref_events, r.n_cur_events, r.ks)
           for r in events_ks_drift(spark, sf_dir).collect()}
    types = {r.event_type for r in rows}
    for t in types:
        ref = sorted(r.value for r in rows
                     if r.event_type == t and r.ts < split)
        cur = sorted(r.value for r in rows
                     if r.event_type == t and r.ts >= split)
        pts = sorted(set(ref) | set(cur))
        import bisect

        d = max(abs(bisect.bisect_right(ref, v) * len(cur)
                    - bisect.bisect_right(cur, v) * len(ref))
                for v in pts)
        ks = round(d / (len(ref) * len(cur)), 4)
        assert got[t] == (len(ref), len(cur), ks)


def test_ivf_gemm_path_matches_expression_path(spark):
    """The Arrow GEMM assignment (C >= IVF_GEMM_MIN_CENTROIDS) must pick
    the SAME cell for every vector as the expression path — same
    round-8 cosine, same (desc, lowest-centroid-id) tie-break; exact
    ties included (duplicate centroids)."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    vecs = [(int(i), [float(x) for x in rng.standard_normal(16)])
            for i in range(300)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = [(int(i), [float(x) for x in rng.standard_normal(16)])
             for i in range(70)]
    cents.append((70, list(cents[3][1])))               # duplicate: tie
    cdf = spark.createDataFrame(
        cents, "centroid_id long, embedding array<float>")

    gemm = {r.vec_id: r.cell
            for r in sim.ivf_assignments(emb, cdf).collect()}
    try:
        sim.IVF_GEMM_MIN_CENTROIDS = 10**9               # force expression
        expr = {r.vec_id: r.cell
                for r in sim.ivf_assignments(emb, cdf).collect()}
    finally:
        sim.IVF_GEMM_MIN_CENTROIDS = int(os.environ.get(
            "SPARK_GRAFT_IVF_GEMM_MIN_CENTROIDS", "64"))
    diff = {k for k in expr if expr[k] != gemm.get(k)}
    assert not diff, sorted(diff)[:10]
    # the GEMM path additionally tolerates a zero vector (cosine 0 to
    # every centroid -> lowest centroid id) where the ANSI expression
    # path would divide by zero
    z = spark.createDataFrame([(300, [0.0] * 16)],
                              "vec_id long, embedding array<float>")
    assert sim.ivf_assignments(z, cdf).first().cell == 0


def test_dsir_logweights_favor_target_profile(spark):
    """DSIR importance weights: docs sharing the target's n-gram profile
    score positive, disjoint-vocabulary docs negative; weights are
    deterministic (pure column math, no rand)."""
    from databricks_import_pyspark_scripts_spark.operators.text import (
        dsir_logweights,
    )

    rows = []
    for i in range(40):                       # target-profile corpus
        rows.append((i, "the quick brown fox jumps over the lazy dog "
                     f"variant {i % 4}", i < 20))
    for i in range(40, 60):                   # disjoint vocabulary
        rows.append((i, "zzz qqq www eee rrr ttt yyy uuu "
                     f"form {i % 3}", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = {r.doc_id: r.dsir_logw
         for r in dsir_logweights(df, "doc_id", "text", "tgt").collect()}
    assert len(w) == 60
    fox_raw = [w[i] for i in range(20, 40)]   # non-target, target-like
    junk = [w[i] for i in range(40, 60)]
    assert min(fox_raw) > max(junk)
    w2 = {r.doc_id: r.dsir_logw
          for r in dsir_logweights(df, "doc_id", "text", "tgt").collect()}
    assert w == w2                            # deterministic


def test_embedding_moments_pca_and_projection(spark):
    """embedding_stats: the distributed single-pass moments equal
    numpy's on the collected data (both float and exact-integer forms);
    PCA components are orthonormal, variance-ordered, deterministic in
    sign; executor-side projection equals the driver-side matmul."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators.embedding_stats import (
        covariance_matrix,
        embedding_moments,
        pca_components,
        project_embeddings,
    )

    rng = np.random.RandomState(11)
    d, n_rows = 8, 200
    base = rng.randn(n_rows, 2) @ rng.randn(2, d) + 0.05 * rng.randn(
        n_rows, d)                       # rank-2 + noise: clear spectrum
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n_rows)],
        "vec_id long, embedding array<double>").repartition(7)

    n, sums, gram = embedding_moments(df, dim=d)
    assert n == n_rows
    assert np.allclose(sums, base.sum(axis=0))
    assert np.allclose(gram, base.T @ base)

    qn, qs, qg = embedding_moments(df, dim=d, quant_scale=1000)
    qx = np.rint(base * 1000).astype(np.int64)
    assert (qs == qx.sum(axis=0)).all() and (qg == qx.T @ qx).all()

    cov = covariance_matrix(n, sums, gram)
    assert np.allclose(cov, np.cov(base.T, bias=True))
    vals, comps = pca_components(cov, 4)
    assert (np.diff(vals) <= 1e-9).all()          # descending
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    # rank-2 signal: first two components dominate
    assert vals[1] > 10 * vals[2]

    mean = sums / n
    got = {r.vec_id: np.array(r.projected) for r in
           project_embeddings(df, comps, mean=mean).collect()}
    want = (base - mean) @ comps.T
    for i in range(n_rows):
        assert np.allclose(got[i], want[i])


def test_moment_partials_driver_rows_bounded(spark):
    """VERDICT r10 #2 regression: the driver-side collect behind
    embedding_moments / logreg_train_newton receives at most TREE_FAN
    rows regardless of the scan's partition count (one partial per TASK
    plus a 64-way tree combine — never one per Arrow batch), and the
    tree-combined moments stay exact."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators.classifier import (
        newton_partials_df,
    )
    from databricks_import_pyspark_scripts_spark.operators.embedding_stats import (
        TREE_FAN,
        embedding_moments,
        moment_partials_df,
    )

    rng = np.random.RandomState(5)
    d, n_rows = 4, 300
    base = rng.randn(n_rows, d)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n_rows)],
        "vec_id long, embedding array<double>").repartition(150)
    assert df.rdd.getNumPartitions() == 150
    assert moment_partials_df(df, dim=d).count() <= TREE_FAN
    qn, qs, qg = embedding_moments(df, dim=d, quant_scale=1000)
    qx = np.rint(base * 1000).astype(np.int64)
    assert qn == n_rows
    assert (qs == qx.sum(axis=0)).all() and (qg == qx.T @ qx).all()

    ldf = spark.createDataFrame(
        [([float(v) for v in base[i]], int(i % 2))
         for i in range(n_rows)],
        "features array<double>, label int").repartition(150)
    assert newton_partials_df(ldf, "features", "label", d,
                              np.zeros(d + 1)).count() <= TREE_FAN


def test_logreg_newton_matches_reference_and_separates(spark):
    """Distributed Newton logistic regression: weights match the
    driver-side numpy twin to float tolerance (partials sum in a
    different order), loss decreases, and a separable synthetic set
    scores > 95% accuracy via the expression scorer."""
    import numpy as np

    from databricks_import_pyspark_scripts_spark.operators.classifier import (
        logreg_reference,
        logreg_score_col,
        logreg_train_newton,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(3)
    n, d = 400, 4
    x = rng.randn(n, d)
    true_w = np.array([1.5, -2.0, 0.5, 3.0])
    y = (x @ true_w + 0.3 * rng.randn(n) > 0).astype(int)
    df = spark.createDataFrame(
        [([float(v) for v in x[i]], int(y[i])) for i in range(n)],
        "features array<double>, label int").repartition(5)

    w, losses = logreg_train_newton(df, "features", "label", dim=d)
    ref = logreg_reference(x, y)
    assert np.allclose(w, ref, rtol=1e-6, atol=1e-8)
    assert losses[-1] < losses[0] and losses[-1] < 0.2
    scored = df.withColumn("p", logreg_score_col(F.col("features"), w))
    acc = (scored.filter(
        ((F.col("p") >= 0.5) & (F.col("label") == 1))
        | ((F.col("p") < 0.5) & (F.col("label") == 0))).count() / n)
    assert acc > 0.95


def test_seed_artifacts_local_match_lazy_subtrees(spark, sf_dir):
    """r15 fused artifact collect: the single-collect local relations
    (_seed_artifacts_local) are FRAME-EQUAL to the lazy id-filtered
    subtrees they stand in for — centroid ids, exact float64-widened
    centroid vectors, and quantize_vec-exact codebook ints — so the
    ivf/pq gates' recompute-per-batch path computes identical artifacts
    with one job instead of 2 collects + 2 broadcast subtree scans."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        CENTROID_MOD,
        _seed_artifacts_local,
        pq_codebook,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents_local, cb_local = _seed_artifacts_local(emb, CENTROID_MOD, 16)
    cents_lazy = (emb.filter(F.col("vec_id") % CENTROID_MOD == 0)
                  .select((F.col("vec_id") / CENTROID_MOD).cast("long")
                          .alias("centroid_id"),
                          F.col("embedding").cast("array<double>")
                          .alias("embedding")))
    a = sorted(map(tuple, cents_local.collect()))
    b = sorted(map(tuple, cents_lazy.collect()))
    assert len(a) > 0
    assert [(i, [float(x) for x in v]) for i, v in a] \
        == [(i, [float(x) for x in v]) for i, v in b]

    cb_lazy = pq_codebook(emb, "vec_id", "embedding")
    la = sorted((int(r["m"]), int(r["j"]), tuple(int(x) for x in r["cbv"]))
                for r in cb_local.collect())
    lb = sorted((int(r["m"]), int(r["j"]), tuple(int(x) for x in r["cbv"]))
                for r in cb_lazy.collect())
    assert len(la) == 16 * 8
    assert la == lb
