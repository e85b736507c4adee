"""Jar-less Iceberg STREAMING SOURCE: a ``readStream``-shaped micro-batch
consumer over a REAL Iceberg snapshot history (VERDICT r12 #6 — the
``streaming/delta_source.py`` twin, so a Flink-CDC-consumer user gets
the same streaming shape on Iceberg).

Structured Streaming's Iceberg source is, mechanically, (1) an offset =
the last processed snapshot ORDINAL, persisted crash-safe, (2) a
micro-batch = the synthesized change rows for ordinals ``(offset,
min(offset + max_snapshots, head)]``, and (3) exactly-once sinks keyed
by the batch's range. This module is that loop over the existing
jar-less machinery:

* offsets ride ``read_ingest_mark`` / ``write_ingest_mark``
  (``sources.delta_log`` — shared mark-file format, atomic temp+rename);
* micro-batches come from ``sources.iceberg.read_iceberg_changes`` —
  the MoR/DML-aware synthesized change feed (position/equality/DV
  deletes, UPDATE/MERGE delete+insert pairs, replace-snapshot
  awareness), every layout the batch reader supports, because it IS
  the batch reader;
* redelivery contract: the mark persists AFTER the batch handler
  returns, so a crash in between re-delivers the same ordinal range —
  handlers must be idempotent on the range. Iceberg appends carrying
  ``txn_app_id``/``txn_version`` (snapshot-summary watermarks, the
  ``stream_iceberg_sink`` mechanism) make that free: the re-delivered
  commit is a no-op.

At 100 TB the offsets/metadata stay driver-side (snapshot JSON +
manifest lists); each micro-batch is a bounded number of snapshots'
file diffs scanned distributed — the same plan the batch change reader
emits. Backpressure is ``max_snapshots_per_batch`` (the
``maxFilesPerTrigger`` analogue at snapshot granularity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.delta_log import read_ingest_mark, write_ingest_mark
from ..sources.iceberg import read_iceberg_changes, read_table_metadata


def stream_iceberg_changes(spark: SparkSession, table_path: str,
                           state_path: str,
                           process_batch: Callable[[DataFrame, int, int],
                                                   None],
                           max_snapshots_per_batch: int | None = None,
                           max_batches: int | None = None) -> int:
    """Drain the snapshot history ``trigger=availableNow``-style:
    repeated micro-batches of ``(last, min(last + max_snapshots_per_
    batch, head)]`` change rows until caught up (or ``max_batches``
    fired). Each batch calls ``process_batch(df, lo, hi)`` with the
    half-open ORDINAL range it covers, THEN persists ``hi`` as the new
    offset — a crash between the two re-delivers ``(lo, hi]``, so the
    handler must be idempotent on the range (txn-keyed sinks below make
    it so). Returns the final high-water mark. A caught-up call costs
    one metadata read, no Spark job.

    The mark is a snapshot ORDINAL, but an ``ordinal:snapshot_id``
    ANCHOR is persisted beside it (``<state_path>.snapid``, atomically,
    BEFORE the mark advances) and validated on resume (ADVICE r13 #2):
    snapshot expiration (the ``iceberg-expire`` maintenance verb)
    removes entries from ``metadata['snapshots']`` and shifts ordinals,
    so a bare ordinal would silently re-serve or skip snapshots after
    expiry — a mismatch fails loudly instead. A crash between the two
    writes leaves the anchor one batch AHEAD of the mark; the anchor's
    own (ordinal, id) pair is what gets validated, so that tear is the
    documented re-delivery, never a spurious failure. Marks written
    before the anchor existed validate as unanchored."""
    last = read_ingest_mark(spark, state_path)
    anchor_path = state_path + ".snapid"
    fired = 0
    snaps = read_table_metadata(spark, table_path).get("snapshots") or []
    if last >= 0:
        if last >= len(snaps):
            raise ValueError(
                f"{table_path}: ingest mark ordinal {last} is beyond "
                f"the snapshot history ({len(snaps)} snapshots) — "
                f"snapshots were expired after the mark was written; "
                f"reset the state at {state_path}")
        anchor = _read_anchor(spark, anchor_path)
        if anchor is not None:
            ao, aid = anchor
            if ao >= len(snaps):
                raise ValueError(
                    f"{table_path}: ingest anchor ordinal {ao} is "
                    f"beyond the snapshot history ({len(snaps)} "
                    f"snapshots) — snapshots were expired; reset the "
                    f"state at {state_path}")
            if int(snaps[ao]["snapshot-id"]) != aid:
                raise ValueError(
                    f"{table_path}: ingest anchor recorded snapshot id "
                    f"{aid} at ordinal {ao}, but the history now holds "
                    f"{snaps[ao]['snapshot-id']} there — snapshot "
                    f"expiration shifted the ordinals; reset the state "
                    f"at {state_path}")
    while max_batches is None or fired < max_batches:
        meta = read_table_metadata(spark, table_path)
        snaps = meta.get("snapshots") or []
        head = len(snaps) - 1
        if head <= last:
            break
        hi = head if max_snapshots_per_batch is None else min(
            head, last + max_snapshots_per_batch)
        batch = read_iceberg_changes(spark, table_path, last, hi)
        process_batch(batch, last, hi)
        write_ingest_mark(spark, anchor_path,
                          f"{hi}:{int(snaps[hi]['snapshot-id'])}")
        write_ingest_mark(spark, state_path, hi)
        last = hi
        fired += 1
    return last


def _read_anchor(spark: SparkSession, path: str) -> tuple[int, int] | None:
    """(ordinal, snapshot_id) from the anchor sidecar; None when absent
    or in a pre-anchor format."""
    from ..sources.delta_log import (
        _exists,
        _is_local,
        _read_bytes,
        _strip_scheme,
    )
    import os

    if _is_local(path):
        sp = _strip_scheme(path)
        if not os.path.exists(sp):
            return None
        with open(sp) as f:
            txt = f.read().strip()
    else:
        if not _exists(spark, path):
            return None
        txt = _read_bytes(spark, path).decode().strip()
    if ":" not in txt:
        return None
    o, s = txt.split(":", 1)
    return int(o), int(s)


def stream_iceberg_first_seen(spark: SparkSession, source_table: str,
                              target_table: str, state_path: str,
                              id_col: str = "doc_id",
                              max_snapshots_per_batch: int | None = None
                              ) -> int:
    """End-to-end first-seen dedup FROM a real Iceberg table INTO a real
    Iceberg table, exactly-once — the ``stream_delta_first_seen`` twin:
    each micro-batch keeps its insert rows whose ``id_col`` was never
    seen before (neither in the target — the seen-store and the output
    are the SAME table, so state needs no side store — nor earlier in
    the batch; first snapshot ordinal wins, ties by id within an
    ordinal) and appends them with a txn identifier keyed on the batch's
    upper ordinal, so a re-delivered batch after a crash-before-mark is
    a committed no-op (the snapshot-summary watermark
    ``append_iceberg`` keeps). Returns the new mark.

    Scale shape: the seen-set probe is a left-anti join against the
    target's ids (column-pruned scan); within-batch first-wins is one
    window by id ordered by ordinal. No driver state at any size."""
    from pyspark.sql import Window

    from ..sources.iceberg import (
        append_iceberg,
        read_iceberg_snapshot,
        write_iceberg_table,
    )

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
        try:
            read_table_metadata(spark, target_table)
            exists = True
        except FileNotFoundError:
            exists = False
        if exists:
            # anti-join against the target's ids (column-pruned scan);
            # AQE picks broadcast vs shuffle by the seen-set's size
            seen = read_iceberg_snapshot(spark, target_table) \
                .select(id_col)
            fresh = fresh.join(seen, on=id_col, how="left_anti")
            append_iceberg(spark, fresh, target_table,
                           txn_app_id=app_id, txn_version=hi)
        else:
            write_iceberg_table(spark, [fresh], target_table)

    return stream_iceberg_changes(
        spark, source_table, state_path, apply,
        max_snapshots_per_batch=max_snapshots_per_batch)
