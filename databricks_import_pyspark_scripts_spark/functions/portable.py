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
