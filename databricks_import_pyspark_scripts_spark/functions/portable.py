"""Portable SQL fragments: the DuckDB-side twins of the Spark column builders
in ``operators.text``. Keeping them in one place means the Spark expression
and its oracle cannot drift independently (querylib imports from here)."""

from __future__ import annotations

from ..operators.dedup import SHINGLE_K
from ..operators.text import TOKEN_PATTERN

# twin of operators.text.tokens_col
TOKENS_SQL = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"


def shingles_sql(k: int = SHINGLE_K, tokens_sql: str = TOKENS_SQL) -> str:
    """Twin of operators.text.shingles_col: distinct k-token shingles, whole
    text as one shingle when shorter than k."""
    return f"""
    CASE WHEN len({tokens_sql}) < {k}
         THEN [array_to_string({tokens_sql}, ' ')]
         ELSE list_distinct(list_transform(
                generate_series(1, len({tokens_sql}) - {k - 1}),
                i -> array_to_string({tokens_sql}[i:i + {k - 1}], ' ')))
    END"""


# twin of operators.text.quality_score_col — the single source for every
# oracle that restates the quality formula (text_quality_score and the
# corpus_prep_pipeline both use this; a literal copy in either would drift
# silently when the formula changes)
QUALITY_SQL = (
    "(0.4 * LEAST(length(text) / 500.0, 1.0)"
    " + 0.3 * (1.0 - LEAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) * 1.0"
    " / GREATEST(length(text), 1), 1.0))"
    " + 0.3 * LEAST(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0))")


def md5_bucket_sql(id_expr: str, buckets: int) -> str:
    """Twin of operators.text.split_bucket_col at arbitrary bucket count:
    first 8 md5 hex digits of the id's string form as an integer, mod
    buckets. Spelled with instr() hex parsing (no from_hex/conv, which not
    every engine shares)."""
    h = f"md5(CAST({id_expr} AS VARCHAR))"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8))
    return f"(CAST({terms} AS BIGINT) % {buckets})"
