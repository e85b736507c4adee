"""Degenerate-input guards for the near-dup LSH operators: exact-duplicate
pre-collapse and the MAX_BUCKET bucket-size cap (operators.dedup).

The adversarial input these defend against: a corpus where one document
appears millions of times. Every copy gets the identical signature, the whole
mass lands in ONE bucket of every band/table, and the within-bucket pair
explode goes quadratic (10M copies -> ~5e13 pairs). The contract is
(a) collapse exact-duplicate mass to a min-id representative before LSH
(collapse_exact_reps — on by default in minhash_lsh_pairs and the embedding
dedup query), and (b) cap residual bucket sizes (bucket_pairs max_bucket).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.dedup import (
    MAX_BUCKET,
    bucket_pairs,
    collapse_exact_reps,
    minhash_lsh_pairs,
    simhash_df,
    simhash_pairs,
)

N_COPIES = 10_000


def _dup_heavy_corpus(spark):
    """10k byte-identical copies of one document, plus a handful of distinct
    docs including one genuine near-dup pair (ids 1 and 2)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    distinct = spark.createDataFrame(
        [(1, base), (2, base + " ok"),
         (3, "completely different content about spark query engines")],
        "doc_id long, text string")
    copies = spark.range(100, 100 + N_COPIES).select(
        F.col("id").alias("doc_id"),
        F.lit("copied boilerplate text repeated verbatim across the whole "
              "corpus many many times").alias("text"))
    return distinct.unionByName(copies)


def test_collapse_exact_reps_min_id_per_fingerprint(spark):
    df = spark.createDataFrame(
        [(5, "Hello, World!"), (2, "hello world"),  # same token stream
         (9, "different doc")],
        "doc_id long, text string")
    reps = {r.doc_id: r.text for r in
            collapse_exact_reps(df, "doc_id", "text").collect()}
    # token-normalized fingerprint collapses punctuation/case variants;
    # min-id representative keeps ITS text
    assert set(reps) == {2, 9}
    assert reps[2] == "hello world"


def test_bucket_pairs_cap_drops_degenerate_bucket(spark):
    rows = ([("big", i) for i in range(12)]
            + [("small", i) for i in range(3)])
    bands = spark.createDataFrame(rows, "bucket string, id long")
    capped = bucket_pairs(bands, ["bucket"], F.col("id"), max_bucket=10).collect()
    # the 12-item bucket is dropped; the 3-item bucket yields C(3,2)=3 pairs
    assert len(capped) == 3
    uncapped = bucket_pairs(bands, ["bucket"], F.col("id")).collect()
    assert len(uncapped) == 12 * 11 // 2 + 3


def test_minhash_lsh_bounded_on_duplicate_mass(spark):
    """10k exact copies must NOT explode: the mass collapses to one
    representative before signatures, so the pair output stays tiny and the
    genuine near-dup pair is still found."""
    df = _dup_heavy_corpus(spark)
    pairs = {(r.id_a, r.id_b)
             for r in minhash_lsh_pairs(df, "doc_id", "text",
                                        threshold=0.5).collect()}
    assert (1, 2) in pairs
    # without collapse this would be ~N_COPIES^2/2 = 5e7 pairs
    assert len(pairs) < 10
    assert not any(a >= 100 and b >= 100 for a, b in pairs)


def test_minhash_lsh_cap_bounds_even_without_collapse(spark):
    """The cap alone (collapse disabled) drops the degenerate bucket: the
    duplicate mass produces no pairs instead of ~5e7."""
    df = _dup_heavy_corpus(spark)
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5,
                              collapse_exact=False,
                              max_bucket=MAX_BUCKET).collect()
    assert len(pairs) < 10
    assert not any(r.id_a >= 100 and r.id_b >= 100 for r in pairs)


def test_simhash_pairs_cap_bounds_duplicate_mass(spark):
    """simhash_pairs takes precomputed signatures (it cannot collapse texts
    itself), so the cap is the guard: 10k identical signatures -> one over-cap
    bucket -> zero pairs from the mass, near-dup pair preserved."""
    df = _dup_heavy_corpus(spark)
    sigs = simhash_df(df, "doc_id", "text")
    pairs = {(r.id_a, r.id_b) for r in simhash_pairs(sigs).collect()}
    assert len(pairs) < 10
    assert not any(a >= 100 and b >= 100 for a, b in pairs)


def test_incremental_neardup_finds_planted_dup(spark):
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        incremental_neardup,
    )

    base = ("the quick brown fox jumps over the lazy dog and then naps "
            "in the warm afternoon sun beside the old oak tree")
    hist = spark.createDataFrame(
        [(1, base),
         (2, "completely unrelated historical text about query engines"),
         (3, base + " today")],  # another near-dup of base, higher id
        "doc_id long, text string")
    newb = spark.createDataFrame(
        [(100, base + " again"),   # near-dup of 1 and 3
         (101, "fresh new content sharing nothing with the history")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           incremental_neardup(hist, newb, "doc_id", "text",
                               threshold=0.5).collect()}
    assert len(got) == 2
    assert got[100].has_near_dup
    # argmax jaccard; both 1 and 3 are candidates — the reported match
    # must carry the maximal jaccard of the two
    assert got[100].best_match_id in (1, 3)
    assert got[100].best_jaccard >= 0.5
    assert not got[101].has_near_dup
    assert got[101].best_match_id is None


def test_incremental_neardup_degenerate_history_band_capped(spark):
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        incremental_neardup,
    )

    # 50 identical history docs: one band value holds all of them. With
    # max_bucket=10 the band is dropped, so the new dup reports NO match —
    # bounded work instead of 50 candidates per new doc.
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    hist = spark.createDataFrame([(i, txt) for i in range(50)],
                                 "doc_id long, text string")
    newb = spark.createDataFrame([(100, txt + " extra")],
                                 "doc_id long, text string")
    capped = incremental_neardup(hist, newb, "doc_id", "text",
                                 threshold=0.5, max_bucket=10).collect()
    assert len(capped) == 1 and not capped[0].has_near_dup
    uncapped = incremental_neardup(hist, newb, "doc_id", "text",
                                   threshold=0.5, max_bucket=None).collect()
    assert uncapped[0].has_near_dup


def test_bucket_pairs_randomized_count_invariant(spark):
    """For ANY bucket layout: pair count == sum C(s,2) over buckets with
    2 <= s <= cap; every pair is (a < b) within a single bucket. Seeded
    random layout so the invariant is exercised beyond hand-picked sizes
    without flaking."""
    import random as _random

    rng = _random.Random(1234)
    sizes = [rng.randint(1, 15) for _ in range(40)]
    cap = 9
    rows = [(f"b{bi}", bi * 1000 + i)
            for bi, s in enumerate(sizes) for i in range(s)]
    bands = spark.createDataFrame(rows, "bucket string, id long")
    got = bucket_pairs(bands, ["bucket"], F.col("id"),
                       max_bucket=cap).collect()
    want = sum(s * (s - 1) // 2 for s in sizes if 2 <= s <= cap)
    assert len(got) == want
    for r in got:
        assert r.a < r.b
        assert r.a // 1000 == r.b // 1000  # same bucket


def test_incremental_index_roundtrip(spark, tmp_path):
    """The stored-index path must be REAL, not narrated: build the band
    index, persist it (partitioned by band_idx — the layout each probe
    prunes on), reload, probe with it, and get row-identical results to
    the recompute-from-texts path; then append the probed batch's own
    bands and verify the updated index serves the next batch without any
    history recompute."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        build_neardup_index,
        incremental_neardup,
    )

    base = ("the quick brown fox jumps over the lazy dog and then naps "
            "in the warm afternoon sun beside the old oak tree")
    hist = spark.createDataFrame(
        [(1, base),
         (2, "completely unrelated historical text about query engines")],
        "doc_id long, text string")
    batch1 = spark.createDataFrame(
        [(100, base + " again"), (101, "fresh unrelated content here")],
        "doc_id long, text string")
    idx_path = str(tmp_path / "neardup_index")
    (build_neardup_index(hist, "doc_id", "text")
     .write.partitionBy("band_idx").parquet(idx_path))
    stored = spark.read.parquet(idx_path)
    with_index = {r.doc_id: (r.has_near_dup, r.best_match_id, r.best_jaccard)
                  for r in incremental_neardup(
                      hist, batch1, "doc_id", "text",
                      threshold=0.5, index=stored).collect()}
    recomputed = {r.doc_id: (r.has_near_dup, r.best_match_id, r.best_jaccard)
                  for r in incremental_neardup(
                      hist, batch1, "doc_id", "text",
                      threshold=0.5).collect()}
    assert with_index == recomputed
    assert with_index[100][0] and with_index[100][1] == 1
    # append batch1's bands; batch2 must now match AGAINST batch1 docs
    (build_neardup_index(batch1, "doc_id", "text")
     .write.mode("append").partitionBy("band_idx").parquet(idx_path))
    full_hist = hist.unionByName(batch1)
    batch2 = spark.createDataFrame(
        [(200, base + " again and again")], "doc_id long, text string")
    got = incremental_neardup(
        full_hist, batch2, "doc_id", "text", threshold=0.5,
        index=spark.read.parquet(idx_path)).collect()[0]
    assert got.has_near_dup and got.best_match_id in (1, 100)
