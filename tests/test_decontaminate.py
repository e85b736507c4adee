"""Aho-Corasick substring decontamination (operators/decontaminate.py):
automaton correctness against a brute-force oracle (randomized +
hand-picked overlap traps), and frame-level agreement between the
mapInPandas scale path and the broadcast-contains expression form — the
same twin discipline the shingle/passage Arrow paths follow."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.operators.decontaminate import (
    build_automaton,
    count_distinct_matches,
    decontaminate_report_aho,
    substring_hits_aho,
)


def _brute(text: str, patterns: list[str]) -> int:
    return sum(1 for p in patterns if p in text)


def test_automaton_overlap_traps():
    """Patterns that are prefixes/suffixes/infixes of each other — the
    cases fail links exist for."""
    pats = ["a", "ab", "abc", "bc", "c", "abab", "baba", "aa"]
    auto = build_automaton(pats)
    for text in ["ababab", "aabbcc", "abcabc", "", "zzz", "a", "abababa",
                 "aaa", "cab", "abba"]:
        assert count_distinct_matches(text, auto) == _brute(text, pats), text


def test_automaton_randomized_against_bruteforce():
    rng = random.Random(77)
    alphabet = "abc"
    for trial in range(200):
        pats = sorted({"".join(rng.choice(alphabet)
                               for _ in range(rng.randint(1, 5)))
                       for _ in range(rng.randint(1, 12))})
        auto = build_automaton(pats)
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        assert count_distinct_matches(text, auto) == _brute(text, pats), (
            trial, pats, text)


def test_automaton_unicode_and_counting_semantics():
    pats = ["straße", "ΣΙΣ", "😀x", "１２"]
    auto = build_automaton(pats)
    assert count_distinct_matches("die straße straße ΣΙΣΥΦΟΣ", auto) == 2
    assert count_distinct_matches("😀x😀x１２３", auto) == 2
    assert count_distinct_matches("STRASSE", auto) == 0  # no case folding


def test_aho_frame_agrees_with_contains_join(spark):
    """The mapInPandas scale path and the BroadcastNestedLoopJoin
    expression form must emit identical reports, adversarial unicode and
    null texts included (null text -> 0 hits in BOTH forms: contains(null,
    c) is null, which the join drops and the left join coalesces to 0)."""
    rows = [
        (1, "İstanbul I İ ı ÅBC straße STRASSE"),
        (2, "needle one hides here"),
        (3, None),
        (4, ""),
        (5, "ΣΙΣΥΦΟΣ σίσυφος needle two"),
        (6, "no hits at all 😀"),
        (7, "needle one and needle two together"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    canaries = spark.createDataFrame(
        [("needle one",), ("needle two",), ("straße",), ("ΣΙΣΥΦΟΣ",)],
        "canary string")

    expr = (d.join(F.broadcast(canaries), F.expr("contains(text, canary)"))
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits")))
    expr_full = {r.doc_id: r.n for r in
                 d.select("doc_id").join(expr, "doc_id", "left")
                 .select("doc_id", F.coalesce("n_hits", F.lit(0)).alias("n"))
                 .collect()}
    aho = {r.doc_id: r.n_canary_hits for r in
           decontaminate_report_aho(d, "doc_id", "text", canaries).collect()}
    assert expr_full == aho == {1: 1, 2: 1, 3: 0, 4: 0, 5: 2, 6: 0, 7: 2}


def test_aho_distinct_count_not_occurrence_count(spark):
    d = spark.createDataFrame([(1, "ab ab ab ab")], "doc_id long, text string")
    out = substring_hits_aho(d, "doc_id", "text", ["ab"]).collect()
    assert [(r.doc_id, r.n_hits) for r in out] == [(1, 1)]


def test_aho_empty_canary_set(spark):
    d = spark.createDataFrame([(1, "anything")], "doc_id long, text string")
    out = substring_hits_aho(d, "doc_id", "text", []).collect()
    assert [(r.doc_id, r.n_hits) for r in out] == [(1, 0)]


def test_aho_automaton_builds_once_per_worker():
    """VERDICT r8 #9: the automaton must build once per worker PROCESS
    per needle set — not once per Arrow batch and not once per
    mapInPandas task. Drive the exported scorer exactly as a worker
    does: many batches per task, many tasks per process; count builds
    via the per-process diagnostic counter."""
    import pandas as pd

    from databricks_import_pyspark_scripts_spark.operators import (
        decontaminate as d,
    )

    needles = [f"needle{i}" for i in range(7)]
    key = "test-key-amortize"
    d._AUTOMATON_CACHE.clear()
    d._BUILD_COUNT["n"] = 0
    scorer = d._make_scorer(lambda: needles, key, "id", "text", 0)

    def batches(lo, n_batches, rows=8):
        for b in range(n_batches):
            base = lo + b * rows
            yield pd.DataFrame({
                "id": range(base, base + rows),
                "text": [f"doc {i} needle{i % 7}"
                         for i in range(base, base + rows)]})

    # one "task": 32 batches -> exactly one build
    out = pd.concat(list(scorer(batches(0, 32))))
    assert len(out) == 256 and (out["n_hits"] == 1).all()
    assert d._BUILD_COUNT["n"] == 1
    # nine more "tasks" in the same process: still one build
    for t in range(9):
        pd.concat(list(scorer(batches(1000 * (t + 1), 4))))
    assert d._BUILD_COUNT["n"] == 1
    assert len(d._AUTOMATON_CACHE) == 1
    # a DIFFERENT needle set evicts and rebuilds (one live automaton per
    # worker, by design) — build count moves by exactly one
    scorer2 = d._make_scorer(lambda: ["other"], "other-key", "id",
                             "text", 0)
    pd.concat(list(scorer2(batches(0, 2))))
    assert d._BUILD_COUNT["n"] == 2
    assert list(d._AUTOMATON_CACHE) == ["other-key"]
