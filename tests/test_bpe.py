"""BPE merge-learning tests: the Spark chain against a plain-Python
reference BPE, plus the greedy-merge string-encoding edge cases."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.bpe import (
    _char_seq,
    bpe_learn_merges,
    word_vocab,
)


def _py_bpe(word_counts: dict[str, int], iters: int):
    """Reference BPE: overlapping pair counts, max-count winner with
    lexicographic tie-break, greedy left-to-right merge."""
    seqs = {w: list(w) for w in word_counts}
    out = []
    for i in range(1, iters + 1):
        counts = Counter()
        for w, syms in seqs.items():
            for j in range(len(syms) - 1):
                counts[(syms[j], syms[j + 1])] += word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        out.append((i, l, r, l + r, c))
        for w, syms in seqs.items():
            merged, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    merged.append(l + r)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            seqs[w] = merged
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_matches_python_reference(spark):
    corpus = [
        (0, "low low low lower lower newest newest newest"),
        (1, "newest widest widest low"),
        (2, "lowest newest low low"),
    ]
    text = " ".join(t for _, t in corpus)
    wc = Counter(text.split())
    want = _py_bpe(dict(wc), 5)
    got = [(r.iter, r.left, r.right, r.merged, r.pair_weight)
           for r in bpe_learn_merges(_docs(spark, corpus), "text", 5)
           .orderBy("iter").collect()]
    assert got == want


def test_bpe_greedy_merge_odd_runs(spark):
    # 'aaa': pairs (a,a) x2 -> merge once greedily -> [aa, a]; next round
    # the winner is (aa, a)
    docs = _docs(spark, [(0, "aaa aaa")])
    got = [(r.left, r.right) for r in
           bpe_learn_merges(docs, "text", 2).orderBy("iter").collect()]
    assert got == [("a", "a"), ("aa", "a")]
    assert got == [(l, r) for _, l, r, _, _ in _py_bpe({"aaa": 2}, 2)]


def test_char_seq_encoding(spark):
    df = _docs(spark, [(0, "ab")]).select(
        _char_seq(F.lit("abc")).alias("s"))
    assert df.head().s == " a  b  c "


def test_word_vocab_counts(spark):
    docs = _docs(spark, [(0, "x y x"), (1, "y x")])
    got = {r.word: r.wcount for r in word_vocab(docs, "text").collect()}
    assert got == {"x": 3, "y": 2}


def _py_bpe_seqs(word_counts: dict[str, int], iters: int):
    """Reference BPE sequences AFTER applying all ``iters`` merges."""
    seqs = {w: list(w) for w in word_counts}
    for _ in range(iters):
        counts = Counter()
        for w, syms in seqs.items():
            for j in range(len(syms) - 1):
                counts[(syms[j], syms[j + 1])] += word_counts[w]
        if not counts:
            break
        (l, r), _c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in seqs.items():
            merged, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    merged.append(l + r)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            seqs[w] = merged
    return seqs


def test_bpe_token_counts_match_python_reference(spark):
    from databricks_import_pyspark_scripts_spark.operators.bpe import (
        bpe_token_counts,
    )

    corpus = [
        (0, "low low low lower lower newest newest newest"),
        (1, "newest widest widest low"),
        (2, "lowest newest low low"),
    ]
    text = " ".join(t for _, t in corpus)
    wc = Counter(text.split())
    seqs = _py_bpe_seqs(dict(wc), 3)
    want = {}
    for did, t in corpus:
        words = t.split()
        want[did] = (len(words), sum(len(seqs[w]) for w in words))
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_token_counts(_docs(spark, corpus), "doc_id",
                                     "text", 3).collect()}
    assert got == want
    # encoding compresses: token count strictly below character count,
    # at or above word count
    for did, t in corpus:
        chars = sum(len(w) for w in t.split())
        assert want[did][0] <= got[did][1] < chars


def test_bpe_merge_supply_exhaustion_keeps_vocab(spark):
    """When every word collapses to one symbol before `iters` runs out,
    remaining iterations are no-ops: the vocabulary must survive and
    token counts equal one per word occurrence -- not vanish."""
    from databricks_import_pyspark_scripts_spark.operators.bpe import (
        bpe_apply_merges,
        bpe_token_counts,
    )

    docs = _docs(spark, [(0, "ab ab ab"), (1, "ab")])
    # merge 1 fuses a+b; afterwards no pairs remain anywhere
    seqs = {r.word: r.s for r in
            bpe_apply_merges(docs, "text", iters=4).collect()}
    assert seqs == {"ab": " ab "}
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_token_counts(docs, "doc_id", "text", 4).collect()}
    assert got == {0: (3, 3), 1: (1, 1)}


def test_bpe_high_iters_single_corpus_scan(spark, tmp_path):
    """At iters >= BPE_MATERIALIZE_ITERS the initial vocab is
    localCheckpointed: the final plan contains ZERO corpus scans (lineage
    cut at the |vocab|-row frame — the corpus aggregate executed exactly
    once, at checkpoint time), where the lazy chain re-embeds one corpus
    scan per iteration. Results must be identical either way."""
    import re

    from databricks_import_pyspark_scripts_spark.operators.bpe import (
        BPE_MATERIALIZE_ITERS,
        bpe_apply_merges,
    )

    corpus = [(i, t) for i, t in enumerate(
        ["low lower lowest", "new newer newest", "wide wider widest",
         "low new wide", "lower newer wider"])]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(corpus, "doc_id long, text string").write.parquet(src)
    docs = spark.read.parquet(src)

    def plan(df):
        return df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution  # noqa: SLF001
            .ExplainMode.fromString("formatted"))

    hi = BPE_MATERIALIZE_ITERS + 1
    chk = bpe_apply_merges(docs, "text", iters=hi)
    assert plan(chk).count("docs.parquet") == 0  # lineage cut: vocab RDD
    assert "Scan ExistingRDD" in plan(chk)
    lazy = bpe_apply_merges(docs, "text", iters=BPE_MATERIALIZE_ITERS - 1)
    assert plan(lazy).count("docs.parquet") >= BPE_MATERIALIZE_ITERS - 1

    # semantics unchanged by materialization: compare hi-iters checkpointed
    # result against the same corpus re-run under a raised threshold
    import databricks_import_pyspark_scripts_spark.operators.bpe as bpe_mod
    got = {r.word: r.s for r in chk.collect()}
    orig = bpe_mod.BPE_MATERIALIZE_ITERS
    try:
        bpe_mod.BPE_MATERIALIZE_ITERS = 10_000
        want = {r.word: r.s
                for r in bpe_apply_merges(docs, "text", iters=hi).collect()}
    finally:
        bpe_mod.BPE_MATERIALIZE_ITERS = orig
    assert got == want
