"""Tokenizer-training queries: BPE merge-rule learning, fully value-checked
— the DuckDB oracle unrolls the identical iteration chain as CTE stages
(the same technique that makes k-means oracle-checkable,
operators/clustering.py), and the greedy merge step is the SQL `replace`
function, whose left-to-right non-overlapping semantics match BPE's merge
rule in both engines (operators/bpe.py has the representation proof)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.portable import TOKENS_SQL
from ..operators.bpe import BPE_ITERS, bpe_learn_merges
from ..sources.registry import load_table
from . import register


def _vocab_cte() -> str:
    return f"""
    vocab AS (
      SELECT word, COUNT(*) AS wcount
      FROM (SELECT unnest({TOKENS_SQL}) AS word FROM documents)
      GROUP BY word),
    s0 AS (
      SELECT word, wcount,
             ' ' || array_to_string(
               list_transform(generate_series(1, length(word)),
                              i -> word[i:i]), '  ') || ' ' AS s
      FROM vocab)"""


def _iter_ctes(i: int) -> str:
    """One BPE iteration: pair counts over s{i-1}, winner b{i}, merged
    sequences s{i}."""
    prev = f"s{i - 1}"
    return f"""
    c{i} AS (
      SELECT pr.l AS lft, pr.r AS rgt,
             CAST(SUM(wcount) AS BIGINT) AS pair_weight
      FROM (
        SELECT wcount,
               unnest(list_transform(
                 generate_series(1, len(sy) - 1),
                 j -> struct_pack(l := sy[j], r := sy[j + 1]))) AS pr
        FROM (SELECT wcount, string_split(trim(s), '  ') AS sy FROM {prev})
        WHERE len(sy) >= 2)
      GROUP BY 1, 2),
    b{i} AS (
      SELECT lft, rgt, pair_weight FROM c{i}
      ORDER BY pair_weight DESC, lft ASC, rgt ASC LIMIT 1),
    s{i} AS (
      SELECT word, wcount,
             CASE WHEN b.lft IS NOT NULL
                  THEN replace(s, ' ' || b.lft || '  ' || b.rgt || ' ',
                               ' ' || b.lft || b.rgt || ' ')
                  ELSE s END AS s
      FROM {prev} LEFT JOIN b{i} b ON TRUE)"""


def _bpe_oracle(iters: int = BPE_ITERS) -> str:
    ctes = _vocab_cte() + "".join("," + _iter_ctes(i)
                                  for i in range(1, iters + 1))
    unions = "\n    UNION ALL ".join(
        f"SELECT {i} AS iter, lft AS \"left\", rgt AS \"right\", "
        f"lft || rgt AS merged, pair_weight FROM b{i}"
        for i in range(1, iters + 1))
    return f"""
    WITH {ctes}
    {unions}
    """


@register(
    "tokenizer_bpe_merges",
    _bpe_oracle(),
    doc=f"BPE tokenizer training, {BPE_ITERS} merge rules: corpus collapses "
        "to its (word, count) vocabulary in ONE full scan, then every "
        "iteration (pair count -> argmax -> greedy merge) runs on |vocab| "
        "rows — the property that makes tokenizer training a Spark job at "
        "100 TB. Greedy left-to-right merge = SQL replace() on the "
        "double-space symbol encoding (bit-identical semantics across "
        "engines); integer pair weights; lexicographic tie-break. Oracle "
        "unrolls the identical iteration chain as CTEs.")
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bpe_learn_merges(docs, "text", BPE_ITERS)


def _bpe_encode_oracle(iters: int = BPE_ITERS) -> str:
    ctes = _vocab_cte() + "".join("," + _iter_ctes(i)
                                  for i in range(1, iters + 1))
    return f"""
    WITH {ctes},
    wtok AS (
      SELECT word, len(string_split(trim(s), '  ')) AS n_tok
      FROM s{iters}),
    docw AS (
      SELECT doc_id, unnest({TOKENS_SQL}) AS word FROM documents)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
    FROM docw JOIN wtok USING (word)
    GROUP BY doc_id
    """


@register(
    "tokenizer_bpe_encode",
    _bpe_encode_oracle(),
    doc=f"BPE tokenizer APPLICATION: per-document token counts under the "
        f"{BPE_ITERS} learned merge rules. The corpus is encoded at the "
        "vocabulary level (the merge chain runs over |vocab| rows, never "
        "per occurrence), then documents join their words to the encoded "
        "vocab's symbol counts — vocab broadcast, one shuffle on doc id. "
        "Oracle extends the learning CTE chain with the final merged "
        "sequences and the same join.")
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_token_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_counts(docs, "doc_id", "text", BPE_ITERS)
