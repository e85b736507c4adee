"""Structured Streaming upgrade path for the batch-incremental pipeline.

The reference is batch micro-ingest: "incremental" means CDF version ranges
replayed per scheduled run (SURVEY.md §2b). These helpers provide the
equivalent continuous form:

* ``stream_changelog`` — readStream over the same changelog-parquet layout
  the batch source uses, so one data convention serves both modes.
* ``cdc_filtered_stream`` — the F1 CDC filter applied to a stream (the
  operator is expression-based, so it composes unchanged).
* ``windowed_event_counts`` — watermarked tumbling-window aggregation (the
  late-data handling the batch pipeline delegates to its external
  scheduler).
* ``run_to_memory`` — drives a stream to completion synchronously against a
  memory sink (local smoke / tests).

At scale: the changelog layout is append-only parquet partitioned by
``_commit_version``; maxFilesPerTrigger bounds per-batch work, watermark
bounds state. State-store partitioning follows shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import filter_data


def stream_changelog(spark: SparkSession, root: str, table: str,
                     schema, max_files_per_trigger: int = 16) -> DataFrame:
    """readStream over ``<root>/<table>_changes`` (same layout as the batch
    changelog source). Streaming parquet needs an explicit schema."""
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(f"{root}/{table}_changes"))


def cdc_filtered_stream(changes: DataFrame, data_type: str,
                        mutability_mode: bool = False) -> DataFrame:
    """F1 CDC semantics on a stream — identical operator, streaming input."""
    return filter_data(changes, data_type, mutability_mode)


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          value_col: str = "value",
                          window: str = "5 minutes",
                          watermark: str = "10 minutes",
                          slide: str | None = None) -> DataFrame:
    """Watermarked tumbling-window counts/sums; append-mode compatible.
    Pass ``slide`` (< window) for overlapping sliding windows — each event
    then lands in window/slide windows."""
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(win.alias("w"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(value_col).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    key_col, "n", "total_value"))


def stateful_user_totals(events: DataFrame, key_col: str = "user_id",
                         value_col: str = "value") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    event count and value total carried in explicit state across micro-
    batches (the pattern for operators watermark windows can't express —
    counters, custom sessionization, model state). State is one small tuple
    per key, partitioned with the shuffle — bounded memory at any scale."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        import pandas as pdlib
        # the output key column carries the caller's key_col name — a
        # hardcoded "user_id" here would silently mislabel session/device
        # keys for downstream joins
        yield pdlib.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]})

    return (events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def stream_unload(filtered: DataFrame, output_path: str,
                  checkpoint_dir: str, fmt: str = "parquet"):
    """Continuous version of the batch unload write: each micro-batch lands
    as date-partitioned files via foreachBatch, reusing the batch writer's
    VOID-scrub + zstd settings. foreachBatch + checkpointing gives at-least-
    once with idempotent-by-batch-id overwrite semantics — the streaming
    analogue of the reference's overwrite-per-run export. Returns the
    StreamingQuery (caller stops it)."""
    from ..sinks.writers import write_export

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Reuse the batch export writer VERBATIM per micro-batch: same
        # VOID-scrub rules, same per-format compression (a hand-rolled
        # option("compression","zstd") here crashed json/csv outright —
        # Spark's text writers have no zstd codec: CODEC_NOT_AVAILABLE).
        # write_export overwrites its target, and the target is the
        # batch-id dir: foreachBatch re-delivers a batch id after a
        # restart-before-checkpoint, and overwrite makes that idempotent —
        # the at-least-once -> effectively-once upgrade this sink claims.
        write_export(batch_df, f"{output_path}/batch_id={batch_id}", fmt)

    return (filtered.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def stream_delta_sink(stream: DataFrame, table_path: str, app_id: str,
                      checkpoint_dir: str,
                      scope_to_checkpoint: bool = True):
    """EXACTLY-ONCE streaming appends into a jar-less Delta table: each
    micro-batch commits as one atomic append carrying a ``txn`` action
    (PROTOCOL.md "Transaction Identifiers" — the same handshake
    delta-spark's streaming sink uses). A redelivered batch id
    (restart-before-checkpoint, foreachBatch's at-least-once window) is a
    NO-OP at commit time because the table itself remembers the app's
    high-water mark — duplicates are impossible rather than merely
    unlikely.

    ``scope_to_checkpoint`` (default True) composes the txn appId from
    ``app_id`` AND the streaming checkpoint's query id (the uuid
    Structured Streaming writes to ``<checkpoint>/metadata`` at start) —
    delta-spark's behavior. A FRESH checkpoint restarts batch ids at 0
    over NEW source offsets, so deduping those against an old watermark
    would silently DROP new data; scoping gives each checkpoint lineage
    its own watermark. Pass False ONLY for deterministically-replayed
    bounded sources where a rerun re-emits the SAME batches and
    cross-checkpoint dedup is the point (the redelivery tests use this).
    The table must already exist (create_delta_table) so concurrent
    first-batch races cannot fork two tables. Returns the StreamingQuery
    (caller stops)."""
    import json as _json
    import os as _os

    from ..sinks.delta_writer import append_delta
    from ..sources.delta_log import _read_bytes, replay_log

    spark = stream.sparkSession
    replay_log(spark, table_path)  # fail fast: table must exist
    resolved: dict[str, str] = {}

    def _app() -> str:
        if not scope_to_checkpoint:
            return app_id
        if "id" not in resolved:
            # written by Structured Streaming at query start; by the time
            # the first batch fires it exists. Read through the Hadoop
            # helpers, not a local open(): the checkpoint location may be
            # hdfs:// / s3a:// / a file: URI (ADVICE r8)
            resolved["id"] = _json.loads(_read_bytes(
                spark, _os.path.join(checkpoint_dir, "metadata"))
                .decode("utf-8"))["id"]
        return f"{app_id}/{resolved['id']}"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_delta(spark, batch_df, table_path,
                     txn_app_id=_app(), txn_version=batch_id)

    return (stream.writeStream
            .foreachBatch(commit_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drive all available input through ``df`` into an in-memory table
    (results at ``SELECT * FROM <name>``), synchronously.

    For windowed aggregations over a finite source use
    ``output_mode="complete"``: in append mode a window only emits once the
    watermark passes its end, which never happens when all input arrives in
    the final batch."""
    q = (df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def sessionized_event_stats(events: DataFrame, ts_col: str = "ts",
                            key_col: str = "user_id",
                            value_col: str = "value",
                            gap: str = "5 minutes",
                            watermark: str = "10 minutes") -> DataFrame:
    """Session-window aggregation: variable-length windows that close after
    ``gap`` of per-key inactivity (F.session_window — the streaming form of
    the batch lag/lead sessionization in window_sessionization_ids). State
    per open session, closed by the watermark — bounded at any scale."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("s"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(value_col).alias("total_value"))
            .select(F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    key_col, "n_events", "total_value"))


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on: str) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension table.
    The static side is re-read per micro-batch (fresh dim data) and planned
    like any batch join — broadcast when small. No state, no watermark
    needed: the canonical pattern for reference-data lookup at any scale."""
    return stream.join(dim, on, "left_outer")


def dedup_stream(events: DataFrame, id_cols: list[str],
                 ts_col: str = "ts", watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within the
    watermark horizon (dropDuplicatesWithinWatermark). State holds one entry
    per key seen inside the horizon, evicted as the watermark advances —
    the streaming form of the batch exact_dedup, and the standard guard in
    an at-least-once ingest pipeline (the reference's retry semantics can
    re-deliver whole version ranges; this operator makes that idempotent)."""
    return (events
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(id_cols))


def stream_stream_join(clicks: DataFrame, purchases: DataFrame,
                       key_col: str = "user_id",
                       within: str = "10 minutes",
                       watermark: str = "20 minutes") -> DataFrame:
    """Watermarked stream-stream inner join: purchase within ``within``
    AFTER the click, matched per key. Both sides buffer state; the time-
    range condition + watermarks bound it (rows older than watermark+range
    are evicted) — without the interval bound the join state would grow
    forever. The streaming form of the batch as-of/range join."""
    c = (clicks.withWatermark("ts", watermark)
         .select(F.col(key_col), F.col("ts").alias("click_ts"),
                 F.col("event_id").alias("click_id")))
    p = (purchases.withWatermark("ts", watermark)
         .select(F.col(key_col).alias("p_user"), F.col("ts").alias("purchase_ts"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("value").alias("purchase_value")))
    return c.join(
        p, (F.col(key_col) == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "inner").drop("p_user")


def make_first_seen_processor(id_col: str, fp_col: str):
    """StatefulProcessor class for ``dedup_stream_stateful``, built at
    module level so its batch logic is unit-testable with a stub handle
    (the container lacks protobuf, which the transformWithState
    state-server needs, so the full-engine test auto-skips — the pure
    Python row logic is covered regardless)."""
    import pandas as pdlib
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class FirstSeen(StatefulProcessor):
        def init(self, handle) -> None:
            self._seen = handle.getValueState("seen", "seen boolean")

        def handleInputRows(self, key, rows, timer_values):
            seen_before_batch = self._seen.exists()
            batch = pdlib.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(id_col, kind="mergesort")
            flags = [True] * len(batch)
            if not seen_before_batch and len(batch) > 0:
                flags[0] = False
            self._seen.update((True,))
            yield pdlib.DataFrame({
                id_col: batch[id_col].values,
                fp_col: [key[0]] * len(batch),
                "seen_before": flags,
            })

        def close(self) -> None:
            pass

    return FirstSeen


def dedup_stream_stateful(docs: DataFrame, id_col: str = "doc_id",
                          fp_col: str = "fingerprint") -> DataFrame:
    """First-seen dedup across ALL micro-batches via Spark 4's
    ``transformWithStateInPandas`` (the successor API to
    applyInPandasWithState): one ValueState flag per content fingerprint,
    emitting every row tagged ``seen_before``.

    Unlike ``dedup_stream`` (dropDuplicates bounded by a watermark
    horizon), the fingerprint state here has no time horizon — it is the
    STREAMING twin of the batch incremental-ingest dedup
    (querylib.dedup.dedup_incremental_new_docs): the state store plays the
    historical fingerprint index. Within a batch, the smallest id is the
    first-seen row (deterministic tie order); rows after it, and all rows
    in later batches, report ``seen_before = true``. State is one boolean
    per distinct fingerprint, partitioned with the shuffle — at scale this
    is RocksDB-backed and effectively the stored index, and a production
    deployment sets a state TTL at the dedup horizon it wants.
    """
    cls = make_first_seen_processor(id_col, fp_col)
    return (docs.groupBy(fp_col).transformWithStateInPandas(
        cls(),
        outputStructType=f"{id_col} long, {fp_col} string, seen_before boolean",
        outputMode="Append",
        timeMode="None"))


def _latest_version(root: str, below: int) -> int | None:
    """Highest committed version STRICTLY below ``below`` in a ``v=<n>``
    directory layout: a redelivered batch id must rebase on its
    PREDECESSOR, not on its own earlier (possibly partial) write —
    otherwise the delta applies twice. Shared by every foreachBatch
    maintainer in this module."""
    import os

    if not os.path.isdir(root):
        return None
    vs = [int(d[2:]) for d in os.listdir(root)
          if d.startswith("v=") and d[2:].isdigit() and int(d[2:]) < below]
    return max(vs) if vs else None


def stream_maintain_agg(deltas: DataFrame, mv_root: str, checkpoint_dir: str,
                        keys: list[str]):
    """Streaming materialized-view maintenance: each micro-batch of an
    insert/delete changelog (columns keys..., val, _op in {'I','D'}) updates
    a persisted (keys..., cnt, total) aggregate via
    operators/merge.maintain_agg — the view is maintained continuously
    without ever rescanning base history.

    The view is versioned per batch id under ``mv_root/v=<batch_id>`` (the
    streaming analogue of the snapshot convention in
    sinks/versioned_writer.py); the highest version is the current view.
    Redelivered batch ids overwrite their own version directory. Local-FS
    path layout (os.listdir); a lakehouse deployment swaps the read-modify-
    write for a transactional MERGE on the view table — the maintain_agg
    delta algebra is identical. Returns the StreamingQuery.
    """
    spark = deltas.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.merge import maintain_agg

        prev_v = _latest_version(mv_root, batch_id)
        if prev_v is None:
            mv_old = (batch_df.select(*keys).limit(0)
                      .withColumn("cnt", F.lit(0).cast("long"))
                      .withColumn("total", F.lit(0).cast("long")))
        else:
            mv_old = spark.read.parquet(f"{mv_root}/v={prev_v}")
        new = maintain_agg(mv_old, batch_df, keys)
        new.write.mode("overwrite").parquet(f"{mv_root}/v={batch_id}")

    return (deltas.writeStream
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def stream_apply_compacted_changes(changes: DataFrame, mirror_root: str,
                                   checkpoint_dir: str, keys: list[str]):
    """Streaming CDC consumer: each micro-batch of CDF rows is COMPACTED to
    its net change per key (operators/merge.compact_changes — a batch may
    span many buffered commits after downtime) and applied to the
    maintained mirror snapshot (apply_changes), committing one version per
    batch id under ``mirror_root/v=<batch_id>`` — the continuously-
    maintained replica of a changelog-fed table.

    Compaction before apply is what bounds the upsert join: after a
    backlog drain the raw batch is O(churn history) while the compacted
    batch is O(touched live keys). Redelivered batch ids rebase on their
    PREDECESSOR version (same redelivery-idempotence discipline as
    ``stream_maintain_agg``). Returns the StreamingQuery.

    Batch-boundary caveat: compaction is robust to a commit's PREIMAGE
    rows landing in a different batch than their postimage (preimages are
    inert in compact_changes), but a same-commit delete+reinsert TIE split
    across two batches resolves by arrival order rather than by the
    in-commit precedence — a hazard shared with raw per-batch
    apply_changes. Sources that emit whole commits per batch (the normal
    CDF stream contract) never hit it.
    """
    spark = changes.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.merge import apply_changes, compact_changes
        from ..sources.versioned import CDC_COLUMNS

        prev_v = _latest_version(mirror_root, batch_id)
        if prev_v is None:
            base = batch_df.drop(*CDC_COLUMNS).limit(0)
        else:
            base = spark.read.parquet(f"{mirror_root}/v={prev_v}")
        net = compact_changes(batch_df, keys)
        new = apply_changes(base, net, keys)
        new.write.mode("overwrite").parquet(f"{mirror_root}/v={batch_id}")

    return (changes.writeStream
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def stream_neardup_gate(docs: DataFrame, history: DataFrame,
                        index: DataFrame, output_path: str,
                        checkpoint_dir: str, id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.5):
    """Streaming ingest near-dup gate: every micro-batch of new documents
    is probed against the STORED MinHash band index
    (``operators.dedup.build_neardup_index`` — built by the
    ``neardup-index`` CLI maintenance verb) and lands annotated with its
    best historical match under ``output_path/batch_id=<n>``.

    This is the continuous form of ``incremental_neardup``: the history
    index and candidate texts are static sides (foreachBatch runs the
    batch operator verbatim — same argmax-jaccard semantics, tested
    against the same planted-dup fixtures), the new batch is the tiny
    streaming side, and nothing history-sized shuffles per batch.
    Batch-id-dir overwrite gives the same idempotent-on-redelivery
    contract as ``stream_unload``. Returns the StreamingQuery (caller
    stops it). A production deployment periodically appends freshly
    ingested bands to the index (the append cycle
    test_incremental_index_roundtrip pins) — within one gate run the
    index is a fixed snapshot, so near-dups WITHIN the stream window are
    deduplicated by the exact first-seen gate
    (``make_first_seen_processor``), not this operator."""
    from ..operators.dedup import incremental_neardup

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        flagged = incremental_neardup(
            history, batch_df, id_col, text_col,
            threshold=threshold, index=index)
        out = batch_df.join(flagged, id_col)
        out.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}")

    return (docs.writeStream
            .foreachBatch(probe_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def stream_psi_monitor(events: DataFrame, ref_rollup: DataFrame,
                       rollup_root: str, report_root: str,
                       checkpoint_dir: str, group_col: str = "event_type",
                       value_col: str = "value"):
    """Continuous distribution-drift gate: each micro-batch folds into a
    cumulative ``(group, bucket, n)`` rollup of the arriving period
    (versioned per batch id under ``rollup_root/v=<n>``, same redelivery-
    rebase discipline as ``stream_maintain_agg``) and a per-batch PSI
    report against the PINNED reference rollup lands under
    ``report_root/v=<n>`` — the monitor a corpus pipeline watches before
    promoting a continuously-ingested slice to training.

    Everything after the per-batch bucket aggregate is ROLLUP arithmetic
    (operators/drift.py): the reference period's raw data is never read —
    only its stored rollup — and the batch fold is the rollup monoid
    (union + re-sum), so state stays |groups| x n_buckets rows no matter
    how much data streams through. The final report equals the batch PSI
    over the same rows (pinned by
    test_stream_psi_monitor_matches_batch_psi). Returns the
    StreamingQuery.
    """
    from ..operators.drift import merge_rollups, psi_from_rollups, value_rollup

    spark = events.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = value_rollup(batch_df, group_col, value_col)
        prev_v = _latest_version(rollup_root, batch_id)
        if prev_v is not None:
            delta = merge_rollups(
                spark.read.parquet(f"{rollup_root}/v={prev_v}"),
                delta, group_col)
        delta.write.mode("overwrite").parquet(f"{rollup_root}/v={batch_id}")
        cur = spark.read.parquet(f"{rollup_root}/v={batch_id}")
        (psi_from_rollups(ref_rollup, cur, group_col)
         .write.mode("overwrite").parquet(f"{report_root}/v={batch_id}"))

    return (events.writeStream
            .foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def stream_iceberg_sink(stream: DataFrame, table_path: str, app_id: str,
                        checkpoint_dir: str,
                        scope_to_checkpoint: bool = True):
    """EXACTLY-ONCE streaming appends into a jar-less Iceberg table —
    the ``stream_delta_sink`` twin: each micro-batch commits as one CAS
    append whose snapshot SUMMARY records (app id, batch id), and a
    redelivered batch id is a no-op at commit time because the table
    itself remembers the app's watermark across the snapshot history —
    duplicates impossible rather than merely unlikely. Same
    ``scope_to_checkpoint`` contract as the Delta sink (a FRESH
    checkpoint restarts batch ids over new offsets; scoping keys each
    checkpoint lineage's watermark separately). The table must already
    exist (write_iceberg_table / append_iceberg history) so concurrent
    first-batch races cannot fork two tables. Returns the
    StreamingQuery (caller stops)."""
    import json as _json
    import os as _os

    from ..sources.delta_log import _read_bytes
    from ..sources.iceberg import append_iceberg, read_table_metadata

    spark = stream.sparkSession
    read_table_metadata(spark, table_path)  # fail fast: table must exist
    resolved: dict[str, str] = {}

    def _app() -> str:
        if not scope_to_checkpoint:
            return app_id
        if "id" not in resolved:
            resolved["id"] = _json.loads(_read_bytes(
                spark, _os.path.join(checkpoint_dir, "metadata"))
                .decode("utf-8"))["id"]
        return f"{app_id}/{resolved['id']}"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_iceberg(spark, batch_df, table_path,
                       txn_app_id=_app(), txn_version=batch_id)

    return (stream.writeStream
            .foreachBatch(commit_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start())
