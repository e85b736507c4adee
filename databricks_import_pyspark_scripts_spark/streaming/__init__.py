"""Streaming equivalents of the batch-incremental pipeline (Structured
Streaming). The reference itself is batch micro-ingest (SURVEY.md §2b:
"incremental" = CDF version ranges replayed per run); modules here provide
the optional readStream/watermark upgrade path."""
