"""Portable expression builders shared by the Spark implementations and the
generated DuckDB oracle SQL (md5-based hashing, token/shingle extraction)."""
