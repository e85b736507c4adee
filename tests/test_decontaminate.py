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
