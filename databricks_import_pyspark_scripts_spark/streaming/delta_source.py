"""Jar-less Delta STREAMING SOURCE: a ``readStream``-shaped micro-batch
consumer over a REAL Delta commit log (VERDICT r11 #3 — the
``spark.readStream.format("delta")`` shape users run, without the jar).

Structured Streaming's Delta source is, mechanically, (1) an offset =
the last processed commit version, persisted in the checkpoint, (2) a
micro-batch = the table changes in ``(offset, min(offset + maxVersions,
head)]``, and (3) exactly-once sinks keyed by the batch's range. This
module is that loop over the existing jar-less machinery:

* offsets ride ``read_ingest_mark`` / ``write_ingest_mark``
  (``sources.delta_log``) — atomic temp+rename, crash-safe;
* micro-batches come from ``read_delta_changes`` — full CDF semantics
  (explicit cdc files, whole-file insert/delete synthesis, DV-aware
  commits), every format feature the batch reader supports, because it
  IS the batch reader;
* redelivery contract: the mark persists AFTER the batch handler
  returns, so a crash in between re-delivers the same version range —
  handlers must be idempotent on the range. ``txn_app_id``-keyed Delta
  appends (PROTOCOL.md transaction identifiers) and the Iceberg
  exactly-once sink make that free: the re-delivered commit is a no-op.

At 100 TB the offsets/metadata stay driver-side (a few versions' JSON),
each micro-batch is a bounded number of commits' files scanned
distributed — the same plan the batch CDF reader emits; backpressure is
``max_versions_per_batch`` (Delta's ``maxFilesPerTrigger`` analogue at
commit granularity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.delta_log import (
    list_delta_versions,
    read_delta_changes,
    read_ingest_mark,
    write_ingest_mark,
)


def stream_delta_changes(spark: SparkSession, table_path: str,
                         state_path: str,
                         process_batch: Callable[[DataFrame, int, int],
                                                 None],
                         max_versions_per_batch: int | None = None,
                         max_batches: int | None = None) -> int:
    """Drain the commit log ``trigger=availableNow``-style: repeated
    micro-batches of ``(last, min(last + max_versions_per_batch, head)]``
    CDF rows until caught up (or ``max_batches`` fired). Each batch
    calls ``process_batch(df, lo, hi)`` with the half-open version range
    it covers, THEN persists ``hi`` as the new offset — crash between
    the two re-delivers ``(lo, hi]``, so the handler must be idempotent
    on the range (txn-keyed sinks below make it so). Returns the final
    high-water mark. A caught-up call costs one log listing, no job."""
    last = read_ingest_mark(spark, state_path)
    fired = 0
    while max_batches is None or fired < max_batches:
        versions = list_delta_versions(spark, table_path)
        head = max(versions) if versions else -1
        if head <= last:
            break
        hi = head if max_versions_per_batch is None else min(
            head, last + max_versions_per_batch)
        batch = read_delta_changes(spark, table_path, last, hi)
        process_batch(batch, last, hi)
        write_ingest_mark(spark, state_path, hi)
        last = hi
        fired += 1
    return last


def stream_delta_first_seen(spark: SparkSession, source_table: str,
                            target_table: str, state_path: str,
                            id_col: str = "doc_id",
                            max_versions_per_batch: int | None = None
                            ) -> int:
    """End-to-end first-seen dedup FROM a real Delta table INTO a real
    Delta table, exactly-once: each micro-batch keeps its insert rows
    whose ``id_col`` was never seen before — neither in the target (the
    seen-store and the output are the SAME table, so state needs no side
    store) nor earlier in the batch (first commit version wins, ties by
    id order within a version) — and appends them with a txn identifier
    keyed on the batch's upper version, so a re-delivered batch after a
    crash-before-mark is a committed no-op. Returns the new mark.

    Scale shape: the seen-set probe is a left-anti join against the
    target's ids (shuffle-pruned to the id column); within-batch
    first-wins is one window by id ordered by commit version. No driver
    state at any size."""
    from ..sinks.delta_writer import append_delta, create_delta_table
    from ..sources.delta_log import is_delta_table, read_delta_snapshot
    from pyspark.sql import Window

    app_id = f"first_seen::{target_table}"

    def apply(batch: DataFrame, lo: int, hi: int) -> None:
        ins = batch.filter(F.col("_change_type") == "insert") \
            .drop("_change_type", "_commit_timestamp")
        w = Window.partitionBy(id_col).orderBy(
            F.col("_commit_version").asc(), F.col(id_col).asc())
        fresh = (ins
                 .withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1)
                 .drop("_rn", "_commit_version"))
        if is_delta_table(spark, target_table):
            # anti-join against the target's ids (column-pruned scan);
            # AQE picks broadcast vs shuffle by the seen-set's size
            seen = read_delta_snapshot(spark, target_table) \
                .select(id_col)
            fresh = fresh.join(seen, on=id_col, how="left_anti")
            append_delta(spark, fresh, target_table,
                         txn_app_id=app_id, txn_version=hi)
        else:
            create_delta_table(spark, fresh, target_table)

    return stream_delta_changes(
        spark, source_table, state_path, apply,
        max_versions_per_batch=max_versions_per_batch)
