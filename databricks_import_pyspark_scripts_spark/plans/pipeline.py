"""The unload pipeline: versioned reads -> CDC filter -> views -> user SQL ->
sized write, with the reference's two-level latest-only retry.

Reference shape (/root/reference/unload_databricks_data_to_s3.py:256-408,
484-512; SURVEY.md §3):

* per table: fetch version range -> CDC filter -> register temp view
* run the user-supplied SQL over the views (the entire relational algebra is
  delegated to Catalyst here)
* size partitions, write JSON or zstd-Parquet, write meta/log sidecars
* E2: if building one table's view hits a missing-change-file error, that
  table silently narrows to latest-snapshot-only ([end,end]) and the incident
  is recorded in table_results.
* E3: lazy evaluation defers read errors to the write; a top-level catch
  re-runs the whole job with force_latest_only=True.

Design deltas vs the reference (SURVEY.md §4 known inefficiencies — all are
scale wins at 100 TB):

* Views are registered under the ORIGINAL table identifiers, so there is no
  textual ``sql.replace(table, view)`` rewrite (which corrupts SQL when one
  table name prefixes another or appears in a string literal).
* No double execution: the count needed for metadata/partition math is
  collected DURING the write via ``df.observe`` instead of a separate
  ``count()`` job that re-runs the entire pipeline.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import filter_data
from ..operators.partitioning import (
    MAX_RECORDS_PER_OUTPUT_FILE,
    calculate_num_partitions,
    size_output,
)
from ..sinks.writers import write_export, write_json_sidecar, write_meta_data, write_text_sidecar
from ..sources.versioned import extract_missing_cdf_error_signature, fetch_data


@dataclass
class UnloadJob:
    """Everything the reference's 12 CLI args carry (C1), minus Databricks."""

    source_root: str
    table_versions: dict[str, list[int]]  # {table: [start, end]}; start==0 -> snapshot
    sql: str
    output_path: str
    data_type: str = "EVENT"
    fmt: str = "parquet"
    partitioning_strategy: str = "none"
    max_records_per_file: int = MAX_RECORDS_PER_OUTPUT_FILE
    target_partitions: int | None = None
    mutability_mode: bool = False
    # range-cluster output files on these columns (file-level data skipping
    # for downstream scans); adds one range shuffle at write time and makes
    # a repartition/coalesce strategy's layout moot (the range exchange is
    # the final layout)
    cluster_by: list[str] | None = None
    # hive-style output directory partitioning (col=value/...): the
    # coarse pruning axis — compose with cluster_by for within-partition
    # file skipping
    partition_by: list[str] | None = None
    # multi-dimension clustering: range-cluster on a Morton key over these
    # columns (operators.layout) so footer min/max serve predicates on ANY
    # of them; mutually exclusive with cluster_by
    zorder_by: list[str] | None = None
    # {col: (lo, hi)} quantization bounds for zorder_by. Supply them from
    # table statistics in production: when None they are computed with a
    # min/max aggregate that RE-EXECUTES the read->transform pipeline once
    # (the same double execution the observe-count design exists to avoid —
    # acceptable for ad-hoc exports, not for the 100 TB path)
    zorder_bounds: dict[str, tuple[float, float]] | None = None
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex)


def quote_dotted_identifiers(sql: str, tables: list[str]) -> str:
    """Backtick-quote dotted table identifiers in the user SQL.

    Temp views are single-part: ``createOrReplaceTempView("`cat.sch.t`")``
    registers a view whose NAME contains dots, and an unquoted ``cat.sch.t``
    in the SQL resolves as catalog.schema.table instead (verified:
    REQUIRES_SINGLE_PART_NAMESPACE). So for dotted names the exact
    identifier occurrence is rewritten to its backticked form. Unlike the
    reference's bare ``str.replace`` (which corrupts prefixes and string
    literals — /root/reference/unload_databricks_data_to_s3.py:312), this
    match is identifier-bounded (no [A-Za-z0-9_.`] on either side) and
    skips string literals and comments: single-quoted (with both
    ''-doubling and backslash escapes — Spark's default non-ANSI mode eats
    ``\'``), double-quoted (a STRING literal in Spark's default mode, and
    an already-quoted identifier under ANSI double-quoted-identifiers —
    neither may be rewritten), ``--`` line comments, and bracketed
    comments.
    """
    import re

    dotted = [t for t in tables if "." in t]
    if not dotted:
        return sql
    # longest-first so cat.sch.t2 is never half-matched by cat.sch.t.
    # Trailing dot IS allowed in the lookahead: `cat.sch.t.col` is a
    # qualified COLUMN reference on the view and must also be rewritten
    # (to `cat.sch.t`.col); a following identifier char still blocks, so
    # cat.sch.t never half-matches inside cat.sch.t2.
    pattern = "|".join(re.escape(t) for t in sorted(dotted, key=len, reverse=True))
    ident = re.compile(rf"(?<![\w.`])({pattern})(?![\w`])")
    # split on literals/comments; rewrite only the code segments (odd
    # indices are the captured skip-spans)
    skip = re.compile(
        r"("
        r"'(?:[^'\\]|\\.|'')*'"          # single-quoted string literal
        r"|\"(?:[^\"\\]|\\.|\"\")*\""    # double-quoted literal/identifier
        r"|--[^\n]*"                     # line comment
        r"|/\*.*?\*/"                    # bracketed comment
        r")",
        re.S)
    parts = skip.split(sql)
    return "".join(
        p if i % 2 else ident.sub(lambda m: f"`{m.group(1)}`", p)
        for i, p in enumerate(parts))


def build_views_for_tables(spark: SparkSession, job: UnloadJob,
                           table_results: dict[str, dict[str, Any]],
                           force_latest_only: bool = False) -> None:
    """Register one temp view per source table, with per-table latest-only
    fallback on missing-change-file errors (E2)."""
    for table, (start, end) in job.table_versions.items():
        result: dict[str, Any] = {
            "initialStartVersion": start,
            "initialEndVersion": end,
        }
        # latest-only = snapshot of the end version (start==0 convention,
        # mirroring the reference's narrow-to-[end,end] CDF fallback).
        use_start, use_end = (0, end) if (force_latest_only and start != 0) else (start, end)
        try:
            df = fetch_data(spark, job.source_root, table, use_start, use_end)
        except Exception as err:  # noqa: BLE001 — classify, then fall back or re-raise
            sig = extract_missing_cdf_error_signature(err)
            if sig is None or use_start == 0:
                raise
            result["initialFetchError"] = f"{sig}: {err}"
            use_start, use_end = 0, end
            df = fetch_data(spark, job.source_root, table, use_start, use_end)
        df = filter_data(df, job.data_type, job.mutability_mode)
        # View named exactly like the table (no textual SQL rewrite needed).
        df.createOrReplaceTempView(f"`{table}`")
        result["finalStartVersion"] = use_start
        result["finalEndVersion"] = use_end
        table_results[table] = result


def _write_with_observed_count(spark: SparkSession, job: UnloadJob,
                               df: DataFrame) -> tuple[int, int]:
    """Write the export, collecting the row count during the write itself.

    Returns (row_count, partition_count_used_for_metadata). Only the
    ``repartition`` strategy needs a pre-write count (its partition math is an
    input to the shuffle); ``coalesce``/``none`` write in one pass with an
    observe() metric.
    """
    from pyspark.sql import Observation

    if job.cluster_by or job.zorder_by:
        # Clustering IS the final layout (range exchange), so every
        # strategy takes the observe path. The observe node must sit ABOVE
        # the range exchange: repartitionByRange runs a separate sampling
        # job over its child subtree to pick range bounds, and a
        # CollectMetrics inside that subtree would be executed twice —
        # measured: the row metric doubled.
        if job.zorder_by:
            from ..operators.layout import with_zorder_key

            if job.cluster_by:
                raise ValueError("cluster_by and zorder_by are mutually "
                                 "exclusive (z-order IS the clustering)")
            clustered = (with_zorder_key(df, job.zorder_by,
                                         bounds=job.zorder_bounds)
                         .repartitionByRange("_zorder")
                         .sortWithinPartitions("_zorder").drop("_zorder"))
        else:
            clustered = (df.repartitionByRange(*job.cluster_by)
                         .sortWithinPartitions(*job.cluster_by))
        obs = Observation(f"unload_{job.run_id}")
        observed = clustered.observe(obs, F.count(F.lit(1)).alias("rows"))
        write_export(observed, job.output_path, job.fmt,
                     max_records_per_file=job.max_records_per_file,
                     partition_by=job.partition_by)
        row_count = int(obs.get["rows"])
        return row_count, calculate_num_partitions(
            df, job.max_records_per_file, job.target_partitions,
            precomputed_count=row_count)
    if job.partitioning_strategy == "repartition" and job.target_partitions is None:
        n = df.count()  # unavoidable: the partition count feeds the shuffle
        sized = size_output(df, "repartition", job.max_records_per_file,
                            precomputed_count=n)
        write_export(sized, job.output_path, job.fmt,
                     max_records_per_file=job.max_records_per_file,
                     partition_by=job.partition_by)
        return n, calculate_num_partitions(df, job.max_records_per_file,
                                           precomputed_count=n)
    obs = Observation(f"unload_{job.run_id}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    if job.partitioning_strategy == "coalesce":
        # coalesce partition math needs target_partitions or a count; with
        # neither, the per-write maxRecordsPerFile option caps file size in
        # one pass (README "Migration deltas"), so coalesce only honors an
        # explicit target here.
        if job.target_partitions is not None:
            observed = observed.coalesce(job.target_partitions)
    elif (job.partitioning_strategy == "repartition"
          and job.target_partitions is not None):
        # target override applies to the repartition strategy only;
        # strategy 'none' means NO shuffle regardless of target (matching
        # size_output's documented semantics)
        observed = observed.repartition(job.target_partitions)
    write_export(observed, job.output_path, job.fmt,
                 max_records_per_file=job.max_records_per_file,
                 partition_by=job.partition_by)
    row_count = int(obs.get["rows"])  # collected during the write — no 2nd job
    return row_count, calculate_num_partitions(
        df, job.max_records_per_file, job.target_partitions,
        precomputed_count=row_count)


def run_unload(spark: SparkSession, job: UnloadJob) -> dict[str, Any]:
    """Execute the full unload with the two-level retry (E3). Returns the run
    report that also lands in ``<output>/logs/run_<id>/table_results.json``."""
    t0 = time.time()
    table_results: dict[str, dict[str, Any]] = {}
    logs: list[str] = []

    def log_info(message: str) -> None:
        # timestamped, print-based (reference C5: avoids Log4j config
        # conflicts), accumulated for the log sidecar (W4)
        line = f"{time.strftime('%Y-%m-%d %H:%M:%S')} {message}"
        print(line)
        logs.append(line)

    def attempt(force_latest_only: bool) -> tuple[int, int]:
        table_results.clear()
        build_views_for_tables(spark, job, table_results, force_latest_only)
        export_df = spark.sql(
            quote_dotted_identifiers(job.sql, list(job.table_versions)))
        ta = time.time()
        counts = _write_with_observed_count(spark, job, export_df)
        log_info(f"write finished in {time.time() - ta:.3f}s "
                 f"(format={job.fmt}, strategy={job.partitioning_strategy})")
        return counts

    log_info(f"run {job.run_id}: tables={list(job.table_versions)} "
             f"data_type={job.data_type} latest_only=False")
    try:
        rows, parts = attempt(force_latest_only=False)
    except Exception as err:  # noqa: BLE001
        sig = extract_missing_cdf_error_signature(err)
        if sig is None:
            raise
        log_info(f"write failed with {sig}; retrying latest-only")
        rows, parts = attempt(force_latest_only=True)

    # delta exports keep their sidecars under underscore-prefixed names:
    # inside a Delta table directory those are invisible to both Delta
    # readers and vacuum (the Delta convention for non-data files), where
    # bare `meta`/`logs` would be vacuum-eligible garbage
    meta_name = "_meta" if job.fmt == "delta" else "meta"
    logs_dir = "_logs" if job.fmt == "delta" else "logs"
    write_meta_data(spark, job.output_path, rows, parts, name=meta_name)
    report = {
        "run_id": job.run_id,
        "rows": rows,
        "partitions": parts,
        "seconds": round(time.time() - t0, 3),
        "table_results": table_results,
        "logs": logs,
    }
    base = f"{job.output_path.rstrip('/')}/{logs_dir}/run_{job.run_id}"
    write_json_sidecar(spark, f"{base}/table_results.json", table_results)
    write_text_sidecar(spark, f"{base}/logs.txt", "\n".join(logs) or "ok")
    return report
