"""spark-graft: a PySpark-native versioned-export & query engine.

Brand-new, idiomatic PySpark implementation of the query and data-processing
capabilities of ``amplitude/databricks-import-pySpark-scripts`` (reference at
/root/reference, read-only), extended with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for 100 TB scale.

Layout:
    sources/    versioned snapshot & changelog reads, table registry
    operators/  CDC filter, VOID scrub, partition sizing, dedup, similarity, text
    functions/  portable (Spark+DuckDB) expression builders, scalar helpers
    plans/      the unload pipeline (views -> SQL transform -> sized write)
    sinks/      JSON / zstd-Parquet writers + metadata/log sidecars
    streaming/  batch-incremental runner + Structured Streaming equivalents
"""

__version__ = "0.1.0"
