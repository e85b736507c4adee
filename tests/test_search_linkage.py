"""Search / linkage / passage-dedup / anomaly operator tests: BM25 ranking
semantics on a hand-checkable corpus, window-edge behavior, containment
bounds, blocked-ER invariants, and MAD flag recomputation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyspark.sql import functions as _F

from databricks_import_pyspark_scripts_spark.operators.linkage import (
    blocked_candidate_pairs,
    deletion_neighborhood_matches,
    deletion_variants_col,
    edit_distance_matches,
)
from databricks_import_pyspark_scripts_spark.operators.search import (
    BM25_B,
    BM25_FIXED,
    BM25_K1,
    bm25_topk,
    containment_pairs,
    doc_lengths,
    duplicate_passage_stats,
    passage_windows_col,
    term_postings,
    top_terms_as_queries,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- BM25 ------------------------------------------------------------------

def _py_bm25(corpus: dict[int, str], query_terms: list[str]) -> dict[int, int]:
    """Reference fixed-point BM25 in plain Python, mirroring the operator's
    rational-idf + quantize-then-sum model."""
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for d, t in toks.items():
        dl = len(t)
        s = 0
        for term in query_terms:
            tf = t.count(term)
            if tf == 0 or term not in df:
                continue
            idf = (n - df[term] + 0.5) / (df[term] + 0.5)
            tfn = (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl)))
            s += int(round(idf * tfn * BM25_FIXED))
        if s:
            out[d] = s
    return out


def test_bm25_matches_python_reference(spark):
    corpus = {
        0: "spark shuffle join shuffle",
        1: "spark scan",
        2: "join join join filter",
        3: "filter scan spark spark spark",
    }
    docs = _docs(spark, list(corpus.items()))
    queries = spark.createDataFrame(
        [(0, "spark"), (0, "join"), (1, "filter")], "qid long, term string")
    got = {(r.qid, r.doc_id): r.score_fx
           for r in bm25_topk(docs, queries, "doc_id", "text", 10).collect()}
    want_q0 = _py_bm25(corpus, ["spark", "join"])
    want_q1 = _py_bm25(corpus, ["filter"])
    assert {d: s for (q, d), s in got.items() if q == 0} == want_q0
    assert {d: s for (q, d), s in got.items() if q == 1} == want_q1


def test_bm25_rank_ordering_and_k(spark):
    docs = _docs(spark, [(i, "alpha " * (i + 1) + "beta") for i in range(8)])
    queries = spark.createDataFrame([(0, "alpha")], "qid long, term string")
    rows = bm25_topk(docs, queries, "doc_id", "text", 3).collect()
    assert len(rows) == 3
    ranks = sorted(r.rank for r in rows)
    assert ranks == [1, 2, 3]
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert all(by_rank[i].score_fx >= by_rank[i + 1].score_fx
               for i in range(len(by_rank) - 1))


def test_top_terms_chunking(spark):
    docs = _docs(spark, [(0, "a a a b b c d"), (1, "a b c c d e")])
    post = term_postings(docs, "doc_id", "text")
    q = top_terms_as_queries(post, 4, 2).collect()
    # counts: a=4 b=3 c=3 d=2 e=1 -> top4 a,b,c,d; qids (0,0,1,1)
    got = {r.term: r.qid for r in q}
    assert got == {"a": 0, "b": 0, "c": 1, "d": 1}


def test_term_not_in_corpus_is_ignored(spark):
    docs = _docs(spark, [(0, "x y z")])
    queries = spark.createDataFrame(
        [(0, "x"), (0, "missing")], "qid long, term string")
    rows = bm25_topk(docs, queries, "doc_id", "text", 5).collect()
    assert len(rows) == 1 and rows[0].doc_id == 0


# --- passage windows -------------------------------------------------------

def test_passage_windows_short_doc_single_window(spark):
    df = _docs(spark, [(0, "only three tokens")])
    wins = df.select(passage_windows_col(F.col("text"), 5).alias("w")).head().w
    assert wins == ["only three tokens"]


def test_passage_windows_stride_one_count(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = _docs(spark, [(0, text)])
    wins = df.select(passage_windows_col(F.col("text"), 4).alias("w")).head().w
    assert len(wins) == 7  # 10 - 4 + 1
    assert wins[0] == "t0 t1 t2 t3" and wins[-1] == "t6 t7 t8 t9"


def test_duplicate_passage_stats_flags_shared_span(spark):
    shared = " ".join(f"s{i}" for i in range(12))
    docs = _docs(spark, [
        (0, shared + " unique0 tail0"),
        (1, "head1 " + shared + " tail1"),
        (2, " ".join(f"u{i}" for i in range(15))),
    ])
    rows = {r.doc_id: r for r in
            duplicate_passage_stats(docs, "doc_id", "text", 12).collect()}
    assert rows[0].has_dup_passage and rows[1].has_dup_passage
    assert not rows[2].has_dup_passage
    assert rows[2].n_dup_windows == 0
    # doc0: 14 tokens -> 3 windows, exactly 1 (the leading span) shared
    assert rows[0].n_windows == 3 and rows[0].n_dup_windows == 1


# --- containment -----------------------------------------------------------

def test_containment_detects_embedded_doc(spark):
    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = "prefix words here " + small + " and a long suffix of more words"
    docs = _docs(spark, [(1, small), (2, big)])
    rows = containment_pairs(docs, "doc_id", "text", 3, 3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a, r.b) == (1, 2)
    # every shingle of the small doc appears in the big one
    assert r.n_shared == r.n_a and r.containment_a == 1.0


def test_containment_bounds_and_threshold(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = containment_pairs(docs, "doc_id", "text", 3, 5).collect()
    for r in rows:
        assert r.a < r.b
        assert r.n_shared >= 5
        assert 0.0 < r.containment_a <= 1.0


def test_containment_stop_shingle_dropped_from_candidates(spark):
    """A shingle shared by most of the corpus (over the DF cap) must emit NO
    candidate rows, while genuinely-contained pairs (rare shingles) are still
    found — and their n_shared counts only the rare shingles."""
    small = "alpha beta gamma delta epsilon zeta eta theta"
    stop = "all rights reserved"
    # 40 docs all ending with the stop-shingle; docs 1/2 also share the
    # rare `small` span (2 < floor, kept). df(stop)=40 > floor 8 and
    # > 5% of 40 -> dropped.
    rows = [(1, small + " " + stop),
            (2, "prefix words here " + small + " suffix words " + stop)]
    rows += [(10 + i, f"unique{i} filler{i} text{i} body{i} " + stop)
             for i in range(38)]
    got = containment_pairs(_docs(spark, rows), "doc_id", "text", 3,
                            min_shared=1).collect()
    pairs = {(r.a, r.b): r for r in got}
    assert (1, 2) in pairs
    # n_shared excludes the stop-shingle span: only `small`'s 6 shingles
    # (alpha..zeta starts) — none of the windows touching `stop` survive
    assert pairs[(1, 2)].n_shared == 6
    # no pair exists ONLY via the stop-shingle
    assert all((a, b) == (1, 2) for a, b in pairs)


def test_containment_guard_bounds_degenerate_corpus(spark):
    """10k docs sharing one boilerplate shingle: unguarded, the self-join
    emits ~5e7 candidate rows before HAVING; the DF guard drops the shingle
    so the pair output is exactly the planted containment pair."""
    small = "alpha beta gamma delta epsilon zeta eta theta"
    stop = "copied boilerplate footer"
    rows = [(1, small), (2, "head words " + small + " tail words")]
    rows += [(100 + i, f"unique{i} filler{i} text{i} " + stop)
             for i in range(10_000)]
    got = containment_pairs(_docs(spark, rows), "doc_id", "text", 3,
                            min_shared=1).collect()
    assert {(r.a, r.b) for r in got} == {(1, 2)}


def test_containment_absolute_df_cap_binds_below_relative(spark):
    """The ABSOLUTE max_df cap must bind even when the relative 5% cap does
    not: a shingle shared by a small fraction of a huge corpus can still
    collect millions of ids into one aggregate row (relative caps are
    corpus-size-relative — ADVICE r6). Here a shingle with df=30 passes
    the relative cap (30/1000 = 3% <= 5%) but exceeds max_df=20, so it
    must contribute ZERO candidate pairs; the planted rare-shingle pair
    survives."""
    small = "alpha beta gamma delta epsilon zeta eta theta"
    mid = "moderately common navigation header"
    rows = [(1, small), (2, "head words " + small + " tail words")]
    # 30 docs share `mid` (df=30: relative-cap pass at n_docs=1002,
    # absolute-cap fail at max_df=20)
    rows += [(100 + i, f"unique{i} filler{i} words{i} " + mid)
             for i in range(30)]
    # pad the corpus so 30 docs are under 5%
    rows += [(10_000 + i, f"pad{i} text{i} body{i} tail{i}")
             for i in range(970)]
    got = containment_pairs(_docs(spark, rows), "doc_id", "text", 3,
                            min_shared=1, max_df=20).collect()
    assert {(r.a, r.b) for r in got} == {(1, 2)}


# --- record linkage --------------------------------------------------------

def test_blocked_pairs_never_cross_blocks(spark):
    recs = spark.createDataFrame(
        [(1, "ann", 10), (2, "ann", 10), (3, "ann", 20)],
        "id long, name string, blk int")
    pairs = blocked_candidate_pairs(recs, "id", ["blk"]).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_edit_distance_matches_threshold(spark):
    recs = spark.createDataFrame(
        [(1, "smith", 1), (2, "smyth", 1), (3, "smithe", 1), (4, "jones", 1)],
        "id long, name string, blk int")
    got = {(r.id_a, r.id_b): r.dist
           for r in edit_distance_matches(recs, "id", "name", ["blk"], 1)
           .collect()}
    assert got == {(1, 2): 1, (1, 3): 1}  # smyth(sub), smithe(ins); jones far


def test_deletion_variants_include_self_and_all_deletes(spark):
    df = spark.createDataFrame([("abc",), ("",)], "s string")
    got = {r.s: r.v for r in
           df.select("s", deletion_variants_col(_F.col("s")).alias("v"))
           .collect()}
    assert sorted(got["abc"]) == sorted(["abc", "bc", "ac", "ab"])
    assert got[""] == [""]


def test_deletion_neighborhood_equals_quadratic_baseline(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey")
    base = {(r.id_a, r.id_b, r.dist) for r in edit_distance_matches(
        cust, "c_custkey", "c_name", ["c_nationkey"], 1).collect()}
    fast = {(r.id_a, r.id_b, r.dist) for r in deletion_neighborhood_matches(
        cust, "c_custkey", "c_name", ["c_nationkey"]).collect()}
    assert fast == base and base  # identical and non-empty


def test_deletion_neighborhood_edge_cases(spark):
    recs = spark.createDataFrame(
        [(1, "ab", 0), (2, "ba", 0),      # transposition: dist 2, must NOT match
         (3, "x", 0), (4, "", 0),         # 1-char vs empty: dist 1 via delete
         (5, "same", 1), (6, "same", 1)], # exact duplicates: dist 0
        "id long, name string, blk int")
    got = {(r.id_a, r.id_b): r.dist for r in deletion_neighborhood_matches(
        recs, "id", "name", ["blk"]).collect()}
    assert got == {(3, 4): 1, (5, 6): 0}


def test_er_on_testdata_is_symmetric_free_and_blocked(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey")
    rows = edit_distance_matches(
        cust, "c_custkey", "c_name", ["c_nationkey"], 1).collect()
    seen = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.dist <= 1
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))


# --- MAD anomaly -----------------------------------------------------------

def test_mad_flags_match_pandas_recompute(spark):
    from databricks_import_pyspark_scripts_spark.querylib.search_linkage import (
        MAD_SIGMA,
        events_anomaly_mad,
    )

    pdf = events_anomaly_mad(spark, SF).toPandas()
    for etype, g in pdf.groupby("event_type"):
        med = g["cnt"].median()
        mad = (g["cnt"] - med).abs().median()
        for _, row in g.iterrows():
            want = abs(row["cnt"] - med) > MAD_SIGMA * mad
            assert bool(row["is_anomaly"]) == bool(want), (etype, row)
            assert math.isclose(row["med"], med) and math.isclose(row["mad"], mad)


# --- triangles / histogram -------------------------------------------------

def test_triangle_count_on_known_graph(spark):
    from databricks_import_pyspark_scripts_spark.operators.graph import (
        triangle_count,
    )

    # K4 on {1,2,3,4} (4 triangles) in group 0; one open wedge in group 1
    k4 = [(0, a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(1, 1, 2), (1, 2, 3)], "g int, src long, dst long")
    got = {r.g: r.n_triangles for r in triangle_count(edges, "g").collect()}
    assert got == {0: 4}
    total = triangle_count(
        edges.filter(F.col("g") == 0)).head().n_triangles
    assert total == 4


def test_triangle_degree_orientation_bounds_hub_wedges(spark):
    """Star graph, hub id 0 below every leaf id: id-orientation would give
    the hub out-degree N (C(N,2) wedges); degree-orientation points every
    edge leaf->hub, so max oriented out-degree is 1 and wedge count is 0 —
    while the triangle count (0 for a star) and, with a closing edge, the
    one genuine triangle are unchanged."""
    from databricks_import_pyspark_scripts_spark.operators.graph import (
        degree_oriented_edges,
        triangle_count,
    )

    n = 200
    star = spark.createDataFrame([(0, i) for i in range(1, n + 1)],
                                 "src long, dst long")
    o = degree_oriented_edges(star)
    out_deg = o.groupBy("u").count().agg(F.max("count")).head()[0]
    assert out_deg == 1  # every edge points leaf -> hub
    assert triangle_count(star).head().n_triangles == 0
    # close one leaf pair: exactly one triangle, still out-degree-bounded
    closed = star.unionByName(
        spark.createDataFrame([(1, 2)], "src long, dst long"))
    assert triangle_count(closed).head().n_triangles == 1


def test_histogram_covers_all_rows_and_clamps_max(spark):
    from databricks_import_pyspark_scripts_spark.querylib.search_linkage import (
        HIST_BUCKETS,
        stats_equiwidth_histogram,
    )

    rows = stats_equiwidth_histogram(spark, SF).collect()
    assert all(0 <= r.bucket < HIST_BUCKETS for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r.cnt for r in rows) == li.count()
    # the max value lands in the last bucket (clamp), never bucket==BUCKETS
    assert max(r.bucket for r in rows) == HIST_BUCKETS - 1


def test_recursive_cte_rollup_tree_invariants(spark):
    from databricks_import_pyspark_scripts_spark.querylib.search_linkage import (
        sql_recursive_cte_rollup,
    )

    rows = {r.ancestor: r for r in sql_recursive_cte_rollup(spark, SF).collect()}
    part = spark.read.parquet(f"{SF}/part.parquet")
    maxkey = part.agg(F.max("p_partkey")).head()[0]
    n = part.count()
    # a leaf (no children: 4*k+1 > maxkey) covers only itself
    leaf = maxkey  # the largest key is always a leaf
    assert rows[leaf].n_desc == 1
    # every node is its own descendant, so total pair count >= n and the
    # root(s) dominate: ancestor 0 covers the whole forest reachable from it
    assert sum(r.n_desc for r in rows.values()) >= n
    # every key's parent chain floor((k-1)/4) terminates at 0, so the root
    # ancestor covers the entire forest
    assert rows[0].n_desc == n


def test_bm25_index_release_unpersists_checkpoint_blocks(spark):
    """The Bm25Index handle must (a) stay tuple-compatible, (b) actually
    free its checkpointed MEMORY_AND_DISK blocks on release() — without
    it, every index built in a long-lived session pins blocks until
    driver GC (the same leak class the LSH self-join persists had)."""
    from databricks_import_pyspark_scripts_spark.operators.search import (
        _persistent_rdd_ids,
        bm25_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta common{i % 3} word{i}") for i in range(50)],
        "doc_id long, text string")
    sc = spark.sparkContext
    base = _persistent_rdd_ids(sc)
    with bm25_index(docs, "doc_id", "text") as idx:
        post, dls = idx  # tuple-compat unpack
        assert post.count() > 0 and dls.count() == 50
        assert len(_persistent_rdd_ids(sc) - base) == 2  # postings + dls
    # context exit released both checkpointed RDDs
    assert _persistent_rdd_ids(sc) - base == set()


def test_containment_floor_survives_pathological_max_df(spark):
    """A caller passing max_df below the floor must NOT lose
    floor-protected shingles: df <= floor passes the guard unconditionally
    and the pair-explode backstop is clamped to max(max_df, floor) — the
    oracle keeps those shingles via its floor branch, so dropping them in
    bucket_pairs would be a silent Spark/oracle divergence."""
    docs = _docs(spark, [(i, "alpha beta gamma delta epsilon")
                         for i in range(1, 7)])  # df=6 <= floor for all
    got = containment_pairs(docs, "doc_id", "text", 3,
                            min_shared=1, max_df=2).collect()
    assert len(got) == 15  # C(6,2): every pair survives via the floor


# --- cross-group passage overlap ------------------------------------------


def _gdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_cross_group_overlap_counts_shared_passages(spark):
    from databricks_import_pyspark_scripts_spark.operators.search import (
        cross_group_passage_overlap,
    )

    shared = "one two three four five six seven eight nine ten eleven twelve"
    docs = _gdocs(spark, [
        (1, f"{shared} alpha beta", "A"),        # shares the 12-token window
        (2, f"intro {shared}", "B"),             # with doc 1 across groups
        (3, "totally different text here", "B"),
        (4, "another unrelated document", "C"),
    ])
    out = cross_group_passage_overlap(docs, "doc_id", "text", "src").collect()
    rows = {(r.group_a, r.group_b): r for r in out}
    assert set(rows) == {("A", "B")}
    r = rows[("A", "B")]
    # doc1 has 3 windows (len 14 -> 14-12+1), doc2 has 2; exactly one hash
    # (the pure `shared` window) occurs in both groups
    assert r.n_shared_passages == 1
    assert r.n_a == 3
    # group B: doc2 contributes 2 windows, doc3 is short (<12 tokens -> one
    # whole-text window) -> 3 distinct hashes
    assert r.n_b == 3
    assert abs(r.overlap_frac - round(1 / 3, 4)) < 1e-9


def test_cross_group_overlap_is_group_level_not_doc_level(spark):
    from databricks_import_pyspark_scripts_spark.operators.search import (
        cross_group_passage_overlap,
    )

    # the same passage in MANY docs of each group still counts ONCE per
    # group pair (distinct (group, h) semantics — the matrix measures
    # corpus-level sharing, not duplicate mass)
    t = "a b c d e f g h i j k l"
    docs = _gdocs(spark, [(i, t, "A") for i in range(5)]
                  + [(i + 10, t, "B") for i in range(5)])
    out = cross_group_passage_overlap(docs, "doc_id", "text", "src").collect()
    assert len(out) == 1
    assert out[0].n_shared_passages == 1
    assert out[0].n_a == 1 and out[0].n_b == 1


def test_cross_group_overlap_max_groups_cap_drops_boilerplate(spark):
    from databricks_import_pyspark_scripts_spark.operators.search import (
        cross_group_passage_overlap,
    )

    boiler = "all rights reserved to the original author of this fine text"
    docs = _gdocs(spark, [(i, boiler, f"g{i}") for i in range(4)])
    # cap below the 4 groups sharing the passage -> no pairs at all
    capped = cross_group_passage_overlap(docs, "doc_id", "text", "src",
                                         max_groups=3).collect()
    assert capped == []
    # cap at the group count -> all 6 pairs appear
    full = cross_group_passage_overlap(docs, "doc_id", "text", "src",
                                       max_groups=4).collect()
    assert len(full) == 6


def test_passage_hashes_carry_cols_match_plain_form(spark):
    from databricks_import_pyspark_scripts_spark.operators.search import (
        passage_hashes_pd_df,
    )

    docs = _gdocs(spark, [
        (1, "one two three four five six seven eight nine ten eleven twelve"
            " thirteen", "A"),
        (2, "short text", "B"),
        (3, None, "C"),  # null text: no rows, in BOTH forms
    ])
    plain = passage_hashes_pd_df(docs, "doc_id", "text")
    carried = passage_hashes_pd_df(docs, "doc_id", "text",
                                   carry_cols=("src",))
    assert sorted((r.doc_id, r.h) for r in plain.collect()) == \
        sorted((r.doc_id, r.h) for r in carried.collect())
    # the carried tag is the doc's own group on every window row
    srcs = {(r.doc_id, r.src) for r in carried.collect()}
    assert srcs == {(1, "A"), (2, "B")}


# --- max benchmark cosine (semantic decontamination) -----------------------


def test_max_benchmark_cosine_exact_on_known_vectors(spark):
    from databricks_import_pyspark_scripts_spark.operators.similarity import (
        max_benchmark_cosine,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(
        [(100, [2.0, 0.0]), (101, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    got = {r.vec_id: r.max_benchmark_cos
           for r in max_benchmark_cosine(corpus, bench).collect()}
    assert got[1] == 1.0          # identical direction to bench 100
    assert got[2] == 0.0          # orthogonal to both
    assert abs(got[3] - 1 / math.sqrt(2)) < 1e-12
