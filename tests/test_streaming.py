"""Structured Streaming equivalents: changelog stream + CDC filter + windowed
watermarked aggregation, driven synchronously through a memory sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
    cdc_filtered_stream,
    run_to_memory,
    stateful_user_totals,
    stream_changelog,
    windowed_event_counts,
)

CHANGE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("ts", TimestampType()),
    StructField("_change_type", StringType()),
    StructField("_commit_version", LongType()),
    StructField("_commit_timestamp", TimestampType()),
])


@pytest.fixture(scope="module")
def stream_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_src"))
    rows = [
        (1, "click", 1.0, "2024-01-01 00:00:30", "insert", 1, "2024-01-01 00:01:00"),
        (2, "click", 2.0, "2024-01-01 00:02:30", "insert", 1, "2024-01-01 00:03:00"),
        (3, "view", 3.0, "2024-01-01 00:06:00", "insert", 2, "2024-01-01 00:06:30"),
        (3, "view", 9.9, "2024-01-01 00:06:00", "update_preimage", 2, "2024-01-01 00:06:30"),
        (4, "view", 4.0, "2024-01-01 00:07:00", "delete", 2, "2024-01-01 00:07:30"),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows],
        "id long, event_type string, value double, ts string, _change_type string, _commit_version long, _commit_timestamp string",
    ).withColumn("ts", F.col("ts").cast("timestamp")) \
     .withColumn("_commit_timestamp", F.col("_commit_timestamp").cast("timestamp"))
    df.write.parquet(f"{root}/ev_changes")
    return root


def test_streaming_cdc_filter(spark, stream_root):
    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    assert stream.isStreaming
    filtered = cdc_filtered_stream(stream, "EVENT")
    run_to_memory(filtered.select("id", "event_type", "value"), "cdc_out")
    got = {r.id for r in spark.sql("SELECT * FROM cdc_out").collect()}
    assert got == {1, 2, 3}  # inserts only; preimage+delete dropped


def test_streaming_windowed_counts(spark, stream_root):
    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    events = cdc_filtered_stream(stream, "EVENT")
    agg = windowed_event_counts(events, window="5 minutes", watermark="10 minutes")
    run_to_memory(agg, "win_out", output_mode="complete")
    rows = {(r.window_start.minute, r.event_type): r.n
            for r in spark.sql("SELECT * FROM win_out").collect()}
    assert rows[(0, "click")] == 2   # 00:00 window: ids 1,2
    assert rows[(5, "view")] == 1    # 00:05 window: id 3


def test_stream_unload_foreachbatch(spark, stream_root, tmp_path):
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import stream_unload

    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    filtered = cdc_filtered_stream(stream, "EVENT").select("id", "event_type", "value")
    q = stream_unload(filtered, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    assert "batch_id" in got.columns  # partitioned by micro-batch


def test_stateful_user_totals(spark, stream_root):
    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    events = (cdc_filtered_stream(stream, "EVENT")
              .withColumnRenamed("id", "user_id"))
    out = stateful_user_totals(events)
    run_to_memory(out, "state_out", output_mode="update")
    rows = {r.user_id: (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM state_out").collect()}
    # inserts only: ids 1, 2, 3 with one event each
    assert rows[1] == (1, 1.0) and rows[2] == (1, 2.0) and rows[3] == (1, 3.0)


def test_session_window_stream(spark, stream_root):
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        sessionized_event_stats,
    )

    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    events = (cdc_filtered_stream(stream, "EVENT")
              .withColumnRenamed("id", "user_id"))
    out = sessionized_event_stats(events, gap="5 minutes")
    run_to_memory(out, "sess_out", output_mode="complete")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    by_user = {r.user_id: r for r in rows}
    # users 1,2,3 each have one event -> one session each, gap-extended end
    assert len(rows) == 3
    assert by_user[1].n_events == 1
    assert (by_user[1].session_end - by_user[1].session_start).seconds == 300


def test_stream_static_enrich(spark, stream_root):
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        stream_static_enrich,
    )

    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    events = cdc_filtered_stream(stream, "EVENT")
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "passive")],
        "event_type string, category string")
    out = stream_static_enrich(events, dim, "event_type")
    assert out.isStreaming
    run_to_memory(out.select("id", "category"), "enrich_out")
    got = {r.id: r.category for r in spark.sql("SELECT * FROM enrich_out").collect()}
    assert got == {1: "engagement", 2: "engagement", 3: "passive"}


def test_dedup_stream(spark, tmp_path):
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import dedup_stream

    # duplicated delivery of id=1 within the watermark horizon
    df = spark.createDataFrame(
        [(1, "click", 1.0, "2024-01-01 00:00:30"),
         (1, "click", 1.0, "2024-01-01 00:01:00"),   # re-delivery
         (2, "view", 2.0, "2024-01-01 00:02:00")],
        "id long, event_type string, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "dedup_src")
    df.write.parquet(src)
    stream = (spark.readStream.schema(
        "id long, event_type string, value double, ts timestamp").parquet(src))
    out = dedup_stream(stream, ["id"])
    run_to_memory(out.select("id"), "dedup_out")
    got = sorted(r.id for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert got == [1, 2]  # duplicate dropped


def test_stream_stream_join(spark, tmp_path):
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        stream_stream_join,
    )

    rows = [
        (1, 10, "click", 0.0, "2024-01-01 00:00:00"),
        (1, 11, "purchase", 9.99, "2024-01-01 00:05:00"),   # within 10 min -> joins
        (1, 12, "purchase", 5.00, "2024-01-01 00:20:00"),   # too late -> dropped
        (2, 20, "click", 0.0, "2024-01-01 00:00:00"),       # no purchase -> no row
        (3, 31, "purchase", 7.00, "2024-01-01 00:01:00"),   # no click -> no row
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "ss_src")
    df.write.parquet(src)
    schema = "user_id long, event_id long, event_type string, value double, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_stream_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"))
    assert out.isStreaming
    run_to_memory(out.select("user_id", "click_id", "purchase_id", "purchase_value"),
                  "ssj_out")
    got = [(r.user_id, r.click_id, r.purchase_id)
           for r in spark.sql("SELECT * FROM ssj_out").collect()]
    assert got == [(1, 10, 11)]  # only the in-window pair


def test_stream_unload_idempotent_on_batch_redelivery(spark, stream_root, tmp_path):
    """foreachBatch can re-deliver a batch id after restart-before-
    checkpoint; the per-batch overwrite must not duplicate rows."""
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import stream_unload

    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    filtered = cdc_filtered_stream(stream, "EVENT").select("id", "event_type", "value")
    q = stream_unload(filtered, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # simulate redelivery of batch 0: new query, fresh checkpoint, same output
    stream2 = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    filtered2 = cdc_filtered_stream(stream2, "EVENT").select("id", "event_type", "value")
    q2 = stream_unload(filtered2, str(tmp_path / "out"), str(tmp_path / "ckpt2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]  # no duplicates


def test_streaming_sliding_windowed_counts(spark, stream_root):
    """slide < window on a real stream: each event lands in exactly
    window/slide overlapping windows (id 1 at 00:00:30 belongs to the
    [23:55,00:05) and [00:00,00:10) 10-minute windows)."""
    stream = stream_changelog(spark, stream_root, "ev", CHANGE_SCHEMA)
    events = cdc_filtered_stream(stream, "EVENT")
    agg = windowed_event_counts(events, window="10 minutes",
                                slide="5 minutes", watermark="10 minutes")
    run_to_memory(agg, "slide_out", output_mode="complete")
    rows = spark.sql("SELECT * FROM slide_out").collect()
    # 3 insert events, each in exactly 2 windows -> total n sums to 6
    assert sum(r.n for r in rows) == 6
    per_event = {}
    for r in rows:
        per_event.setdefault(r.event_type, 0)
        per_event[r.event_type] += r.n
    assert per_event == {"click": 4, "view": 2}


def test_dedup_stream_stateful_cross_batch(spark, tmp_path):
    """transformWithStateInPandas first-seen dedup: within-batch ties go to
    the min id, and state persists across micro-batches (the second file's
    re-delivery of fingerprint 'aaa' reports seen_before).

    Auto-skips where the protobuf wheel is absent: Spark 4's
    transformWithState Python state-server protocol imports
    google.protobuf at worker startup (same skip policy as the
    delta-spark round-trip test)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf")
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        dedup_stream_stateful,
    )

    src = str(tmp_path / "sdedup_src")
    ckpt = str(tmp_path / "sdedup_ckpt")
    spark.createDataFrame(
        [(3, "aaa"), (1, "aaa"), (2, "bbb")],
        "doc_id long, fingerprint string").write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, fingerprint string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = dedup_stream_stateful(stream)
    q = (out.writeStream.format("memory").queryName("sdedup_out")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    q.processAllAvailable()
    got = {(r.doc_id, r.seen_before)
           for r in spark.sql("SELECT * FROM sdedup_out").collect()}
    # min id per fingerprint is first-seen; the duplicate within the batch
    # is flagged
    assert got == {(1, False), (3, True), (2, False)}
    # second batch: same fingerprints arrive again -> all seen_before
    spark.createDataFrame([(9, "aaa"), (10, "ccc")],
                          "doc_id long, fingerprint string") \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    prog = q.lastProgress
    q.stop()
    got2 = {(r.doc_id, r.seen_before)
            for r in spark.sql("SELECT * FROM sdedup_out").collect()}
    assert (9, True) in got2        # cross-batch state hit
    assert (10, False) in got2      # genuinely new fingerprint
    ops = [op["operatorName"] for op in prog["stateOperators"]]
    assert any("transformWithStateInPandas" in op.lower() or "transform" in op.lower()
               for op in ops), ops


def test_first_seen_processor_logic_with_stub_state():
    """The pure batch logic of the transformWithState dedup, driven with a
    stub handle (no streaming engine, no protobuf): within-batch min-id
    wins, repeated keys across calls report seen_before."""
    import pandas as pd

    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        make_first_seen_processor,
    )

    class StubState:
        def __init__(self):
            self._v = None
        def exists(self):
            return self._v is not None
        def update(self, v):
            self._v = v

    class StubHandle:
        def __init__(self):
            self.state = StubState()
        def getValueState(self, name, schema):
            return self.state

    proc = make_first_seen_processor("doc_id", "fingerprint")()
    proc.init(StubHandle())
    out1 = pd.concat(list(proc.handleInputRows(
        ("aaa",), iter([pd.DataFrame({"doc_id": [3, 1]})]), None)))
    got1 = sorted(zip(out1.doc_id, out1.seen_before))
    assert got1 == [(1, False), (3, True)]
    out2 = pd.concat(list(proc.handleInputRows(
        ("aaa",), iter([pd.DataFrame({"doc_id": [9]})]), None)))
    assert list(zip(out2.doc_id, out2.seen_before)) == [(9, True)]


def test_stream_maintain_agg_matches_recompute(spark, tmp_path):
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        stream_maintain_agg,
    )

    src = tmp_path / "deltas"
    schema = "k string, val long, _op string"
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [("a", 10, "I"), ("a", 5, "I"), ("b", 7, "I")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("a", 5, "D"), ("b", 7, "D"), ("c", 3, "I")], schema
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = stream_maintain_agg(stream, str(tmp_path / "mv"),
                            str(tmp_path / "ckpt"), ["k"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import os
    versions = sorted(int(d[2:]) for d in os.listdir(tmp_path / "mv")
                      if d.startswith("v="))
    assert len(versions) >= 2  # the deltas arrived over multiple batches
    final = {r.k: (r.cnt, r.total) for r in spark.read.parquet(
        f"{tmp_path}/mv/v={versions[-1]}").collect()}
    # recompute from the union of all deltas: a: +10+5-5, b: +7-7 (gone),
    # c: +3
    assert final == {"a": (1, 10), "c": (1, 3)}


def test_stream_apply_compacted_changes_mirrors_log(spark, tmp_path):
    """Streaming CDC mirror: batches of CDF rows (incl. in-batch churn that
    compaction nets out) maintain a replica equal to replaying the full
    log. Batch 1: inserts + an insert-then-delete key (never lands).
    Batch 2: update chain + delete + re-insert-style tie."""
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        stream_apply_compacted_changes,
    )

    src = tmp_path / "cdf"
    schema = ("k long, v string, _change_type string, "
              "_commit_version long, _commit_timestamp timestamp")
    import datetime

    t = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, "a1", "insert", 1, t), (2, "b1", "insert", 1, t),
         (3, "c1", "insert", 1, t), (3, "c1", "delete", 2, t)],
        schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, "a1", "update_preimage", 3, t),
         (1, "a2", "update_postimage", 3, t),
         (1, "a2", "update_preimage", 4, t),
         (1, "a3", "update_postimage", 4, t),
         (2, "b1", "delete", 3, t),
         (4, "d1", "insert", 4, t)],
        schema).coalesce(1).write.parquet(str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = stream_apply_compacted_changes(
        stream, str(tmp_path / "mirror"), str(tmp_path / "ckpt"), ["k"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import os
    versions = sorted(int(d[2:]) for d in os.listdir(tmp_path / "mirror")
                      if d.startswith("v="))
    assert len(versions) >= 2
    final = {r.k: r.v for r in spark.read.parquet(
        f"{tmp_path}/mirror/v={versions[-1]}").collect()}
    assert final == {1: "a3", 4: "d1"}


def test_stream_neardup_gate_flags_against_stored_index(spark, tmp_path):
    """The streaming ingest gate: micro-batches probe the stored band
    index and land annotated — the planted near-dup is flagged with its
    historical match, the fresh doc passes clean."""
    from databricks_import_pyspark_scripts_spark.operators.dedup import (
        build_neardup_index,
    )
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        stream_neardup_gate,
    )

    base = ("the quick brown fox jumps over the lazy dog and naps "
            "in the warm afternoon sun beside the old oak tree")
    hist = spark.createDataFrame(
        [(1, base), (2, "unrelated historical text about query engines")],
        "doc_id long, text string")
    idx_path = str(tmp_path / "bands")
    (build_neardup_index(hist, "doc_id", "text")
     .write.partitionBy("band_idx").parquet(idx_path))
    src = str(tmp_path / "incoming")
    spark.createDataFrame(
        [(100, base + " again"), (101, "fresh clean content here")],
        "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "gated")
    q = stream_neardup_gate(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        hist, spark.read.parquet(idx_path), out,
        str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {100, 101}
    assert got[100].has_near_dup and got[100].best_match_id == 1
    assert not got[101].has_near_dup
    assert "text" in spark.read.parquet(out).columns  # original cols kept


def test_stream_psi_monitor_matches_batch_psi(spark, tmp_path):
    """Drift gate equivalence: stream the 'current' period in two
    micro-batches against a pinned reference rollup; the final streamed
    report must equal the batch events_psi_drift gate on the same rows
    (which computes both periods from raw data in one scan)."""
    from databricks_import_pyspark_scripts_spark.operators.drift import (
        value_rollup,
    )
    from databricks_import_pyspark_scripts_spark.querylib.product_analytics import (
        PSI_SPLIT_TS,
        events_psi_drift,
    )
    from databricks_import_pyspark_scripts_spark.streaming.pipeline import (
        stream_psi_monitor,
    )

    sf_dir = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    split = F.lit(PSI_SPLIT_TS).cast("timestamp")
    ref_rollup = value_rollup(e.filter(F.col("ts") < split),
                              "event_type", "value")
    # current period arrives as a stream, split into two files/batches
    cur = e.filter(~(F.col("ts") < split)).select("event_type", "value",
                                                  "event_id")
    src = tmp_path / "cur"
    cur.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "f1"))
    cur.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "f2"))
    stream = (spark.readStream.schema("event_type string, value double, "
                                      "event_id long")
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    q = stream_psi_monitor(stream, ref_rollup, str(tmp_path / "roll"),
                           str(tmp_path / "rep"), str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import os
    versions = sorted(int(d[2:]) for d in os.listdir(tmp_path / "rep")
                      if d.startswith("v="))
    assert len(versions) >= 2  # arrived over multiple batches
    streamed = {r.event_type: (r.n_ref_events, r.n_cur_events, r.psi)
                for r in spark.read.parquet(
                    f"{tmp_path}/rep/v={versions[-1]}").collect()}
    batch = {r.event_type: (r.n_ref_events, r.n_cur_events, r.psi)
             for r in events_psi_drift(spark, sf_dir).collect()}
    assert streamed == batch


# ---------------------------------------------------------------------------
# jar-less Delta STREAMING SOURCE (streaming/delta_source.py — the
# readStream-shaped micro-batch consumer over a real commit log)


def _mk_cdf_table(spark, path, lo, hi):
    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        create_delta_table,
    )

    df = spark.range(lo, hi).selectExpr("id AS doc_id",
                                        "CAST(id AS double) AS v")
    create_delta_table(spark, df, path, cdf=True)


def test_stream_delta_changes_micro_batches_and_resume(spark, tmp_path):
    """availableNow-style drain: bounded micro-batches cover the commit
    log exactly once and in order; a caught-up call fires nothing; new
    commits after catch-up resume from the persisted offset."""
    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        append_delta,
        delete_where,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_log import (
        read_delta_changes,
    )
    from databricks_import_pyspark_scripts_spark.streaming.delta_source import (
        stream_delta_changes,
    )

    src = str(tmp_path / "src")
    mark = str(tmp_path / "mark")
    _mk_cdf_table(spark, src, 0, 10)                       # v0
    append_delta(spark, spark.range(10, 20).selectExpr(
        "id AS doc_id", "CAST(id AS double) AS v"), src)   # v1
    delete_where(spark, src, "doc_id % 4 = 0")             # v2
    append_delta(spark, spark.range(20, 25).selectExpr(
        "id AS doc_id", "CAST(id AS double) AS v"), src)   # v3

    ranges, rows = [], []

    def collect(df, lo, hi):
        ranges.append((lo, hi))
        rows.extend((r.doc_id, r._change_type, r._commit_version)
                    for r in df.collect())

    hwm = stream_delta_changes(spark, src, mark, collect,
                               max_versions_per_batch=2)
    assert hwm == 3
    assert ranges == [(-1, 1), (1, 3)]       # bounded, ordered, disjoint
    # union of micro-batches == one full batch CDF pull
    full = sorted((r.doc_id, r._change_type, r._commit_version)
                  for r in read_delta_changes(spark, src, -1, 3).collect())
    assert sorted(rows) == full

    # caught up: no batch fires
    ranges.clear()
    assert stream_delta_changes(spark, src, mark, collect) == 3
    assert ranges == []

    # new commit -> exactly the new range, resumed from the mark
    append_delta(spark, spark.range(25, 28).selectExpr(
        "id AS doc_id", "CAST(id AS double) AS v"), src)   # v4
    rows.clear()
    assert stream_delta_changes(spark, src, mark, collect) == 4
    assert ranges == [(3, 4)]
    assert sorted(r[0] for r in rows) == [25, 26, 27]


def test_stream_delta_first_seen_exactly_once_redelivery(spark, tmp_path):
    """End-to-end first-seen dedup from a REAL Delta source into a REAL
    Delta target: duplicate ids across commits keep only their first
    occurrence; a crash-before-mark redelivery (mark rolled back by
    hand) appends NOTHING new (anti-join + txn identifier); later
    genuinely-new ids still land."""
    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        append_delta,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_log import (
        read_delta_snapshot,
        write_ingest_mark,
    )
    from databricks_import_pyspark_scripts_spark.streaming.delta_source import (
        stream_delta_first_seen,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    mark = str(tmp_path / "mark")
    _mk_cdf_table(spark, src, 0, 6)                        # v0: 0..5
    append_delta(spark, spark.range(3, 9).selectExpr(
        "id AS doc_id", "CAST(id AS double) AS v"), src)   # v1: 3..8 (3 dup)
    append_delta(spark, spark.range(6, 12).selectExpr(
        "id AS doc_id", "CAST(id AS double) AS v"), src)   # v2: 6..11

    hwm = stream_delta_first_seen(spark, src, tgt, mark,
                                  max_versions_per_batch=1)
    assert hwm == 2
    got = sorted(r.doc_id for r in read_delta_snapshot(spark, tgt).collect())
    assert got == list(range(12))            # each id exactly once

    # crash-before-mark: roll the offset back and re-drain — redelivered
    # batches must not duplicate anything
    write_ingest_mark(spark, mark, 0)
    assert stream_delta_first_seen(spark, src, tgt, mark) == 2
    got = sorted(r.doc_id for r in read_delta_snapshot(spark, tgt).collect())
    assert got == list(range(12))

    # fresh ids (plus one stale) after catch-up
    append_delta(spark, spark.range(11, 15).selectExpr(
        "id AS doc_id", "CAST(id AS double) AS v"), src)   # v3
    assert stream_delta_first_seen(spark, src, tgt, mark) == 3
    got = sorted(r.doc_id for r in read_delta_snapshot(spark, tgt).collect())
    assert got == list(range(15))


def test_stream_iceberg_changes_micro_batches_and_resume(spark, tmp_path):
    """The Iceberg twin of stream_delta_changes (VERDICT r12 #6):
    bounded micro-batches over snapshot ORDINALS cover the history
    exactly once and in order — including a MoR DELETE ordinal's change
    rows; a caught-up call fires nothing; new snapshots after catch-up
    resume from the persisted offset."""
    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        append_iceberg,
        iceberg_delete_where,
        read_iceberg_changes,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.streaming.iceberg_source import (
        stream_iceberg_changes,
    )

    src = str(tmp_path / "src")
    mark = str(tmp_path / "mark")

    def frame(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id AS doc_id", "CAST(id AS double) AS v")

    write_iceberg_table(spark, [frame(0, 10)], src)          # ord 0
    append_iceberg(spark, frame(10, 20), src)                # ord 1
    iceberg_delete_where(spark, src, "doc_id % 4 = 0")       # ord 2
    append_iceberg(spark, frame(20, 25), src)                # ord 3

    ranges, rows = [], []

    def collect(df, lo, hi):
        ranges.append((lo, hi))
        rows.extend((r.doc_id, r._change_type, r._commit_version)
                    for r in df.collect())

    hwm = stream_iceberg_changes(spark, src, mark, collect,
                                 max_snapshots_per_batch=2)
    assert hwm == 3
    assert ranges == [(-1, 1), (1, 3)]       # bounded, ordered, disjoint
    # union of micro-batches == one full batch change pull
    full = sorted((r.doc_id, r._change_type, r._commit_version)
                  for r in read_iceberg_changes(spark, src, -1, 3)
                  .collect())
    assert sorted(rows) == full
    assert any(ct == "delete" for _, ct, _ in rows)   # the MoR ordinal

    # caught up: no batch fires
    ranges.clear()
    assert stream_iceberg_changes(spark, src, mark, collect) == 3
    assert ranges == []

    # new snapshot -> exactly the new range, resumed from the mark
    append_iceberg(spark, frame(25, 28), src)                # ord 4
    rows.clear()
    assert stream_iceberg_changes(spark, src, mark, collect) == 4
    assert ranges == [(3, 4)]
    assert sorted(r[0] for r in rows) == [25, 26, 27]


def test_stream_iceberg_first_seen_exactly_once_redelivery(spark,
                                                           tmp_path):
    """End-to-end first-seen dedup from a REAL Iceberg source into a
    REAL Iceberg target (VERDICT r12 #6): duplicate ids across
    snapshots keep only their first occurrence; a crash-before-mark
    redelivery (mark rolled back by hand) appends NOTHING new
    (anti-join + snapshot-summary txn watermark); later genuinely-new
    ids still land."""
    from databricks_import_pyspark_scripts_spark.sources.delta_log import (
        write_ingest_mark,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        append_iceberg,
        read_iceberg_snapshot,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.streaming.iceberg_source import (
        stream_iceberg_first_seen,
    )

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    mark = str(tmp_path / "mark")

    def frame(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id AS doc_id", "CAST(id AS double) AS v")

    write_iceberg_table(spark, [frame(0, 6)], src)       # ord 0: 0..5
    append_iceberg(spark, frame(3, 9), src)              # ord 1: 3..8
    append_iceberg(spark, frame(6, 12), src)             # ord 2: 6..11

    hwm = stream_iceberg_first_seen(spark, src, tgt, mark,
                                    max_snapshots_per_batch=1)
    assert hwm == 2
    got = sorted(r.doc_id for r in
                 read_iceberg_snapshot(spark, tgt).collect())
    assert got == list(range(12))            # each id exactly once

    # crash-before-mark: roll the offset back and re-drain — redelivered
    # batches must not duplicate anything
    write_ingest_mark(spark, mark, 0)
    assert stream_iceberg_first_seen(spark, src, tgt, mark) == 2
    got = sorted(r.doc_id for r in
                 read_iceberg_snapshot(spark, tgt).collect())
    assert got == list(range(12))

    # fresh ids (plus one stale) after catch-up
    append_iceberg(spark, frame(11, 15), src)            # ord 3
    assert stream_iceberg_first_seen(spark, src, tgt, mark) == 3
    got = sorted(r.doc_id for r in
                 read_iceberg_snapshot(spark, tgt).collect())
    assert got == list(range(15))


def test_readstream_format_delta_jarless(spark, tmp_path):
    """REAL spark.readStream over the jar-less log via the Python Data
    Source API: appends stream exactly-once into a checkpointed parquet
    sink; a restart on the same checkpoint resumes from the persisted
    offset (no replay, no loss); a delete commit fails the stream loudly
    unless ignoreDeletes=true skips it."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        append_delta,
        create_delta_table,
        delete_where,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # one file per commit so the later delete is FILE-ALIGNED: a
    # remove-only commit, the shape ignoreDeletes exists for (a partial
    # delete rewrites files, which a table-view stream cannot skip
    # without re-serving the rewrite — Delta's own ignoreChanges caveat)
    df0 = spark.range(0, 10).selectExpr(
        "id AS k", "CAST(id AS double) AS v").coalesce(1)
    create_delta_table(spark, df0, src)
    append_delta(spark, spark.range(10, 15).selectExpr(
        "id AS k", "CAST(id AS double) AS v").coalesce(1), src)

    def drain(out_dir, ckpt_dir, **opts):
        reader = (spark.readStream.format("delta_jarless")
                  .option("path", src))
        for key, val in opts.items():
            reader = reader.option(key, val)
        q = (reader.load().writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        ks = [r.k for r in spark.read.parquet(out_dir)
              .select("k").collect()]
        assert len(ks) == len(set(ks)), "duplicate rows: not exactly-once"
        return sorted(ks)

    assert drain(out, ckpt) == list(range(15))

    # restart on the SAME checkpoint: only the new commit streams
    append_delta(spark, spark.range(15, 18).selectExpr(
        "id AS k", "CAST(id AS double) AS v").coalesce(1), src)
    assert drain(out, ckpt) == list(range(18))

    # a delete commit must fail the stream loudly ...
    delete_where(spark, src, "k < 10")      # drops file 1 whole
    with pytest.raises(StreamingQueryException, match="removes data"):
        drain(out, ckpt)
    # ... and ignoreDeletes skips it. Engine caveat (Spark's
    # AvailableNowDataStreamWrapper around Python sources): the first
    # restart after a FAILED batch settles only the recovered batch,
    # the following trigger continues with new data.
    append_delta(spark, spark.range(18, 20).selectExpr(
        "id AS k", "CAST(id AS double) AS v").coalesce(1), src)
    assert drain(out, ckpt, ignoreDeletes="true") == list(range(18))
    assert drain(out, ckpt, ignoreDeletes="true") == list(range(20))

    # maxVersionsPerTrigger bounds each micro-batch's commit span; a
    # fresh checkpoint replays the full append history (the deleted
    # file's rows included — stream semantics, not table semantics)
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    assert drain(out2, ckpt2, ignoreDeletes="true",
                 maxVersionsPerTrigger="1") == list(range(20))


def test_readstream_format_iceberg_jarless(spark, tmp_path):
    """REAL spark.readStream over a jar-less Iceberg snapshot history via
    the Python Data Source API (the delta_jarless twin): appends stream
    exactly-once into a checkpointed parquet sink; a restart on the same
    checkpoint resumes from the persisted ordinal; compaction snapshots
    are transparently skipped; a DELETE snapshot fails the stream loudly
    unless ignoreDeletes=true; the batch half serves live files with
    merge-on-read position deletes applied."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        append_iceberg,
        compact_iceberg_table,
        iceberg_delete_where,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg_stream_datasource import (
        register_iceberg_stream_source,
    )

    register_iceberg_stream_source(spark)
    src = str(tmp_path / "src")

    def frame(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id AS k", "CAST(id AS double) AS v").coalesce(1)

    write_iceberg_table(spark, [frame(0, 10)], src)      # ord 0
    append_iceberg(spark, frame(10, 15), src)            # ord 1

    def drain(out_dir, ckpt_dir, **opts):
        reader = (spark.readStream.format("iceberg_jarless")
                  .option("path", src))
        for key, val in opts.items():
            reader = reader.option(key, val)
        q = (reader.load().writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        ks = [r.k for r in spark.read.parquet(out_dir)
              .select("k").collect()]
        assert len(ks) == len(set(ks)), "duplicate rows: not exactly-once"
        return sorted(ks)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    assert drain(out, ckpt) == list(range(15))

    # restart on the SAME checkpoint: only the new snapshot streams;
    # a compaction (replace) snapshot in the span is skipped silently
    append_iceberg(spark, frame(15, 18), src)            # ord 2
    compact_iceberg_table(spark, src)                    # ord 3: replace
    assert drain(out, ckpt) == list(range(18))

    # a DELETE snapshot fails the stream loudly ...
    iceberg_delete_where(spark, src, "k < 5")            # ord 4
    append_iceberg(spark, frame(18, 20), src)            # ord 5
    with pytest.raises(StreamingQueryException, match="deletes rows"):
        drain(out, ckpt)
    # ... and ignoreDeletes skips it: the recovered batch spans BOTH
    # the delete ordinal (skipped) and the later append (served)
    assert drain(out, ckpt, ignoreDeletes="true") == list(range(20))
    assert drain(out, ckpt, ignoreDeletes="true") == list(range(20))

    # bounded admission on a fresh checkpoint replays the full append
    # history (deleted rows included — stream semantics)
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    assert drain(out2, ckpt2, ignoreDeletes="true",
                 maxSnapshotsPerTrigger="1") == list(range(20))

    # batch half: the current snapshot's live position deletes apply
    # MERGE-ON-READ in the executor (per-task applicable-delete scan)
    got_mor = sorted(r.k for r in spark.read.format("iceberg_jarless")
                     .option("path", src).load().select("k").collect())
    assert got_mor == list(range(5, 20))
    # a clean append-only table batch-reads its live files
    src2 = str(tmp_path / "clean")
    write_iceberg_table(spark, [frame(0, 6)], src2)
    append_iceberg(spark, frame(6, 9), src2)
    got = sorted(r.k for r in spark.read.format("iceberg_jarless")
                 .option("path", src2).load().select("k").collect())
    assert got == list(range(9))
    # column pruning reaches the pyarrow read
    assert spark.read.format("iceberg_jarless").option("path", src2) \
        .load().select("v").count() == 9


def test_iceberg_jarless_mor_batch_read(spark, tmp_path):
    """Merge-on-read in the iceberg_jarless BATCH half: v2
    position-delete parquet applies via the per-task applicable-delete
    scan, v3 puffin DVs via plan-shipped bitmaps, EQUALITY deletes via
    the plan-time sequence-scoped per-task anti-join (VERDICT r13 #2),
    all three layouts compose on one table, pushed filters prune data
    files WITHOUT breaking delete application, and results equal the
    full-semantics reader's."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        iceberg_delete_where,
        read_iceberg_snapshot,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg_stream_datasource import (
        register_iceberg_stream_source,
    )

    register_iceberg_stream_source(spark)
    t = str(tmp_path / "mor")
    df = spark.range(0, 60).selectExpr("id AS k", "id % 5 AS g")
    write_iceberg_table(spark, [df.repartition(3)], t)

    def jarless(filter_sql=None):
        d = spark.read.format("iceberg_jarless").option("path", t).load()
        if filter_sql:
            d = d.filter(filter_sql)
        return sorted(x.k for x in d.select("k").collect())

    def oracle():
        return sorted(x.k for x in
                      read_iceberg_snapshot(spark, t).collect())

    # v2 position-delete parquet across 3 data files
    iceberg_delete_where(spark, t, "k % 7 = 0", mode="position")
    expect = [k for k in range(60) if k % 7 != 0]
    assert jarless() == expect == oracle()

    # pushed filter composes with the delete scan (pruned files simply
    # don't ship their partitions; survivors still subtract positions)
    assert jarless("k >= 30") == [k for k in expect if k >= 30]

    # v3 puffin DV layered on top (upgrades the table to v3); both
    # layouts now live simultaneously
    iceberg_delete_where(spark, t, "k % 11 = 3", mode="dv")
    expect2 = [k for k in expect if k % 11 != 3]
    assert jarless() == expect2 == oracle()

    # time travel: asOfOrdinal / snapshotId pick past snapshots —
    # ordinal 0 predates both deletes; the position-delete snapshot's
    # exact id reproduces its MoR state
    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        iceberg_snapshot_ids,
    )

    def jarless_at(**opts):
        d = spark.read.format("iceberg_jarless").option("path", t)
        for key, val in opts.items():
            d = d.option(key, str(val))
        return sorted(x.k for x in d.load().select("k").collect())

    assert jarless_at(asOfOrdinal=0) == list(range(60))
    sids = [s["snapshot_id"] for s in iceberg_snapshot_ids(spark, t)]
    assert jarless_at(snapshotId=sids[1]) == expect
    with pytest.raises(Exception, match="not in the history"):
        jarless_at(snapshotId=123456789)
    with pytest.raises(Exception, match="out of range"):
        jarless_at(asOfOrdinal=99)

    # equality deletes (VERDICT r13 #2): applied with sequence scoping,
    # composing with the position deletes and DVs already live; result
    # equals the full-semantics reader
    iceberg_delete_where(spark, t, "g = 2", mode="equality",
                         equality_cols=["g"])
    expect3 = [k for k in expect2 if k % 5 != 2]
    assert jarless() == expect3 == oracle()
    # the eq key column (g) is re-read for the match even when the
    # projection prunes it out — "k"-only select above already proves
    # it; a filtered projection composes too
    assert jarless("k >= 30") == [k for k in expect3 if k >= 30]


def test_iceberg_jarless_eq_delete_reinsert_and_nulls(spark, tmp_path):
    """Datasource twin of the full reader's equality-delete semantics
    (VERDICT r13 #2): the strictly-older sequence rule lets a row
    re-inserted AFTER the delete survive (CDC upsert), delete rows with
    NULL keys match NULL-keyed data rows null-safely, and both states
    equal the full-semantics reader."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        append_iceberg,
        read_iceberg_snapshot,
        write_iceberg_equality_deletes,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg_stream_datasource import (
        register_iceberg_stream_source,
    )

    register_iceberg_stream_source(spark)
    t = str(tmp_path / "eq")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g"))
    write_iceberg_table(spark, [base], t)                   # seq 1
    dels = spark.createDataFrame([(1,), (3,)], "g long")
    write_iceberg_equality_deletes(spark, t, dels, ["g"])   # seq 2
    reins = spark.range(100, 110).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("g"))
    append_iceberg(spark, reins, t)                         # seq 3

    def jarless():
        return sorted(x.k for x in
                      spark.read.format("iceberg_jarless")
                      .option("path", t).load().select("k").collect())

    expect = [k for k in range(40) if k % 4 in (0, 2)] + \
        list(range(100, 110))
    assert jarless() == expect
    assert jarless() == sorted(
        x.k for x in read_iceberg_snapshot(spark, t).collect())

    # null-safe key matching
    t2 = str(tmp_path / "eqnull")
    base2 = spark.range(0, 12).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.lit(None))
        .otherwise(F.col("id") % 3).cast("long").alias("g"))
    write_iceberg_table(spark, [base2], t2)
    write_iceberg_equality_deletes(
        spark, t2, spark.createDataFrame([(None,)], "g long"), ["g"])
    got2 = sorted(x.k for x in spark.read.format("iceberg_jarless")
                  .option("path", t2).load().select("k").collect())
    assert got2 == [k for k in range(12) if k % 3 != 0]


def test_iceberg_jarless_offset_snapshot_anchor(spark, tmp_path):
    """ADVICE r13 #2: streaming offsets anchor on SNAPSHOT ID, ordinal
    as hint. After snapshot expiration shifts the ordinals, a restart
    fails loudly instead of silently re-serving/skipping snapshots."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        append_iceberg,
        expire_iceberg_snapshots,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg_stream_datasource import (
        register_iceberg_stream_source,
    )

    register_iceberg_stream_source(spark)
    t = str(tmp_path / "anchor")

    def frame(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    write_iceberg_table(spark, [frame(0, 5)], t)            # ordinal 0
    append_iceberg(spark, frame(5, 10), t)                  # ordinal 1
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("iceberg_jarless")
             .option("path", t).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return sorted(x.k for x in spark.read.parquet(out).collect())

    assert drain() == list(range(10))       # offset ordinal 1 recorded
    append_iceberg(spark, frame(10, 15), t)                 # ordinal 2
    append_iceberg(spark, frame(15, 20), t)                 # ordinal 3
    # expire the two oldest snapshots: ordinals shift down by two
    res = expire_iceberg_snapshots(spark, t, keep_last=2)
    assert len(res["expired"]) == 2
    with pytest.raises(StreamingQueryException,
                       match="expiration shifted the ordinals"):
        drain()


def test_stream_iceberg_changes_anchor(spark, tmp_path):
    """ADVICE r13 #2 for the availableNow loop: the persisted ingest
    mark carries an ordinal:snapshot_id anchor; resume after snapshot
    expiration shifted the ordinals fails loudly."""
    from pyspark.sql import functions as F

    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        append_iceberg,
        expire_iceberg_snapshots,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.streaming.iceberg_source import (
        stream_iceberg_changes,
    )

    t = str(tmp_path / "loop")
    state = str(tmp_path / "state" / "mark")

    def frame(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    write_iceberg_table(spark, [frame(0, 5)], t)            # ordinal 0
    append_iceberg(spark, frame(5, 10), t)                  # ordinal 1
    seen: list[tuple[int, int]] = []
    mark = stream_iceberg_changes(
        spark, t, state, lambda df, lo, hi: seen.append((lo, hi)))
    assert mark == 1 and seen == [(-1, 1)]
    # caught-up resume with an intact history: clean no-op
    assert stream_iceberg_changes(
        spark, t, state, lambda df, lo, hi: seen.append((lo, hi))) == 1
    assert seen == [(-1, 1)]
    append_iceberg(spark, frame(10, 15), t)                 # ordinal 2
    append_iceberg(spark, frame(15, 20), t)                 # ordinal 3
    expire_iceberg_snapshots(spark, t, keep_last=2)
    with pytest.raises(ValueError,
                       match="expiration shifted the ordinals"):
        stream_iceberg_changes(
            spark, t, state, lambda df, lo, hi: None)


def test_delta_jarless_dv_column_mapped_partitioned(spark, tmp_path):
    """VERDICT r12 #4 + ADVICE r12 #4: the delta_jarless source streams
    (and batch-reads) the DBR-14+-default table shape — column mapping
    'name' mode, a deletion vector on a live file, AND a partitioned
    layout whose partition values exist only in add.partitionValues.
    Each InputPartition carries the resolved physical names, the
    compressed DV bitmap, and the typed partition value; checkpoint
    restart serves only new commits."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from delta_fixture import _commit

    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        append_delta,
        delete_where,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "cmdv")
    log = os.path.join(src, "_delta_log")
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-p1"}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-p2"}},
            {"name": "part", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-p3"}},
        ]})

    def write_file(rel, ks):
        path = os.path.join(src, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(pa.table(
            {"col-p1": pa.array(ks, pa.int64()),
             "col-p2": pa.array([float(k) for k in ks], pa.float64())},
            schema=pa.schema([
                pa.field("col-p1", pa.int64(),
                         metadata={b"PARQUET:field_id": b"1"}),
                pa.field("col-p2", pa.float64(),
                         metadata={b"PARQUET:field_id": b"2"})])), path)

    write_file("pa/f0.parquet", [0, 1, 2])
    write_file("pb/f1.parquet", [3, 4])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": ["part"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
            "createdTime": 1690000000000}},
        {"add": {"path": "pa/f0.parquet",
                 "partitionValues": {"col-p3": "a"}, "size": 1,
                 "dataChange": True, "modificationTime": 1}},
        {"add": {"path": "pb/f1.parquet",
                 "partitionValues": {"col-p3": "b"}, "size": 1,
                 "dataChange": True, "modificationTime": 2}},
    ])
    # DV delete through the repo's writer: remove+re-add of f0 with a
    # deletion vector killing k=1
    delete_where(spark, src, "k = 1", ts_ms=2000, use_dv=True)

    def drain(out_dir, ckpt_dir, **opts):
        reader = (spark.readStream.format("delta_jarless")
                  .option("path", src))
        for key, val in opts.items():
            reader = reader.option(key, val)
        q = (reader.load().writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return {(r.k, r.part): r.v for r in
                spark.read.parquet(out_dir).collect()}

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # fresh checkpoint over the full history: commit 0's files are
    # re-planned AT the current metadata; the DV re-add in commit 1
    # needs ignoreChanges (a rewrite), and its file is served minus the
    # DV'd row. The original serve of f0 (commit 0) is planned with the
    # head's column plan but its OWN add action — which the DV commit
    # replaced, so only the re-add carries the bitmap.
    got = drain(out, ckpt, ignoreChanges="true")
    # f0 served twice (commit 0 pre-DV + commit 1 re-add with DV) is
    # Delta's own ignoreChanges caveat; the parquet sink dedupes nothing,
    # so assert via the DICT (k, part) -> v, which collapses re-serves
    assert got == {(0, "a"): 0.0, (1, "a"): 1.0, (2, "a"): 2.0,
                   (3, "b"): 3.0, (4, "b"): 4.0}

    # batch half: the snapshot read applies the DV (k=1 gone) and
    # attaches partition values
    snap = {(r.k, r.part): r.v for r in
            spark.read.format("delta_jarless").option("path", src)
            .load().collect()}
    assert snap == {(0, "a"): 0.0, (2, "a"): 2.0,
                    (3, "b"): 3.0, (4, "b"): 4.0}

    # restart on the same checkpoint: a physical-layout append via the
    # repo's writer streams exactly the new rows, partition col attached
    rep_schema = spark.read.format("delta_jarless").option(
        "path", src).load().schema
    newdf = spark.createDataFrame([(10, 10.0, "c"), (11, 11.0, "c")],
                                  rep_schema).coalesce(1)
    append_delta(spark, newdf, src, ts_ms=3000)
    got2 = drain(out, ckpt, ignoreChanges="true")
    assert got2 == {**got, (10, "c"): 10.0, (11, "c"): 11.0}


def test_jarless_datasources_push_filter_file_pruning(spark, tmp_path):
    """pushFilters (Spark 4.1 Python Data Source): the batch readers
    prune files whose stats/partition values prove no match — and the
    filtered RESULTS stay exactly correct because every filter is
    returned for Spark's re-evaluation (inexact pushdown). Checked at
    the planner level (partitions() count) and e2e."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 1):
        pytest.skip("pushFilters needs Spark 4.1")

    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        append_delta,
        create_delta_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        DeltaLogBatchReader,
        register_delta_stream_source,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg import (
        append_iceberg,
        write_iceberg_table,
    )
    from databricks_import_pyspark_scripts_spark.sources.iceberg_stream_datasource import (
        IcebergLogBatchReader,
        register_iceberg_stream_source,
    )

    register_delta_stream_source(spark)
    register_iceberg_stream_source(spark)

    def frame(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id AS k", "CAST(id AS double) AS v").coalesce(1)

    # Delta: 3 single-file commits with disjoint k ranges + a partition
    dsrc = str(tmp_path / "d")
    create_delta_table(spark, frame(0, 10).withColumn(
        "part", F.lit("a")), dsrc, partition_by=["part"])
    append_delta(spark, frame(10, 20).withColumn("part", F.lit("b")),
                 dsrc)
    append_delta(spark, frame(20, 30).withColumn("part", F.lit("c")),
                 dsrc)

    r = DeltaLogBatchReader(
        spark.read.format("delta_jarless").option("path", dsrc)
        .load().schema, {"path": dsrc})
    assert len(r.partitions()) == 3
    r.pushFilters([GreaterThanOrEqual(("k",), 20)])
    assert len(r.partitions()) == 1          # stats pruning
    r.pushFilters([EqualTo(("part",), "b")])
    assert len(r.partitions()) == 1          # partition pruning
    r.pushFilters([EqualTo(("part",), "zzz")])
    assert len(r.partitions()) == 0
    # e2e: the pushed + re-evaluated filter returns exact rows
    got = sorted(x.k for x in spark.read.format("delta_jarless")
                 .option("path", dsrc).load()
                 .filter("k >= 20 OR part = 'b'").select("k").collect())
    assert got == list(range(10, 30))

    # Iceberg: 2 append snapshots with disjoint k ranges
    isrc = str(tmp_path / "i")
    write_iceberg_table(spark, [frame(0, 10)], isrc)
    append_iceberg(spark, frame(100, 110), isrc)
    ri = IcebergLogBatchReader(
        spark.read.format("iceberg_jarless").option("path", isrc)
        .load().schema, {"path": isrc})
    assert len(ri.partitions()) == 2
    ri.pushFilters([GreaterThanOrEqual(("k",), 100)])
    assert len(ri.partitions()) == 1         # manifest-bounds pruning
    ri.pushFilters([EqualTo(("k",), 5)])
    assert len(ri.partitions()) == 1
    got = sorted(x.k for x in spark.read.format("iceberg_jarless")
                 .option("path", isrc).load()
                 .filter("k >= 100").select("k").collect())
    assert got == list(range(100, 110))


def test_delta_jarless_nested_column_mapped_struct(spark, tmp_path):
    """Nested column-mapped STRUCTS read through the datasource: the
    legacy-protocol CM fixture (logical id/info<score,tag>/part stored
    physically as col-aaa1..5, partitioned by part) batch-reads AND
    streams with nested fields renamed to logical names in the executor
    (_logicalize_arrow); results equal the full-semantics batch
    reader's."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from delta_fixture import make_column_mapped_table

    from databricks_import_pyspark_scripts_spark.sources.delta_log import (
        read_delta_snapshot,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "cmnested")
    make_column_mapped_table(src)

    expect = {(r.id, r.part): (r.info.score, r.info.tag)
              for r in read_delta_snapshot(spark, src).collect()}
    got = {(r.id, r.part): (r.info.score, r.info.tag)
           for r in spark.read.format("delta_jarless")
           .option("path", src).load().collect()}
    assert got == expect and len(got) == 3

    # streaming from the same table: full history = same rows
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (spark.readStream.format("delta_jarless").option("path", src)
         .load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got_s = {(r.id, r.part): (r.info.score, r.info.tag)
             for r in spark.read.parquet(out).collect()}
    assert got_s == expect


def test_delta_jarless_column_mapped_collections(spark, tmp_path):
    """Column mapping INSIDE array/map element types reads through the
    datasource (batch + stream): tags array<struct<score,label>> and
    props map<string,struct<x>> stored under physical names at every
    level rebuild zero-copy in the executor (_logicalize_arrow list/map
    branches) with nulls preserved at every level — null array, null
    element, empty collections, null map value. Results equal the
    full-semantics batch reader's."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from delta_fixture import make_column_mapped_collections_table

    from databricks_import_pyspark_scripts_spark.sources.delta_log import (
        read_delta_snapshot,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "cmcoll")
    make_column_mapped_collections_table(src)

    def canon(rows):
        return {
            r.id: (
                None if r.tags is None else tuple(
                    None if e is None else (e.score, e.label)
                    for e in r.tags),
                None if r.props is None else tuple(sorted(
                    (k, None if v is None else v.x)
                    for k, v in r.props.items())),
            ) for r in rows}

    expect = canon(read_delta_snapshot(spark, src).collect())
    assert len(expect) == 4 and expect[2] == (None, None)
    assert expect[1] == (((0.5, "a"), (1.5, "b")), (("k", 7),))
    assert expect[4] == ((None, (2.5, "c")), (("m", 9), ("n", None)))

    got = canon(spark.read.format("delta_jarless")
                .option("path", src).load().collect())
    assert got == expect

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (spark.readStream.format("delta_jarless").option("path", src)
         .load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert canon(spark.read.parquet(out).collect()) == expect


def test_delta_jarless_checkpointed_log(spark, tmp_path):
    """Classic checkpoints in the jarless datasource: after log cleanup
    retires the json prefix, the batch reader seeds live state from the
    newest checkpoint <= versionAsOf, and the stream serves the
    checkpoint's live set as one INITIAL SNAPSHOT batch (deletes in the
    retired span already netted out — Delta-source semantics) before the
    surviving json commits. Single-part, hand-split multi-part, and a
    v2 uuid-named top-level parquet (VERDICT r13 #3)."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from databricks_import_pyspark_scripts_spark.delta import DeltaTable
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "cpt")
    t = DeltaTable.create(spark, spark.range(10).selectExpr("id AS k"),
                          src)
    t.append(spark.range(10, 15).selectExpr("id AS k"))      # v1
    t.delete("k < 5")                                        # v2
    assert t.checkpoint() == 2
    t.append(spark.range(15, 20).selectExpr("id AS k"))      # v3

    log = os.path.join(src, "_delta_log")
    for v in range(3):                                 # log cleanup
        os.remove(os.path.join(log, f"{v:020d}.json"))

    def ks(**opts):
        r = spark.read.format("delta_jarless").option("path", src)
        for key, val in opts.items():
            r = r.option(key, val)
        return sorted(x.k for x in r.load().select("k").collect())

    assert ks() == list(range(5, 20))
    assert ks(versionAsOf="2") == list(range(5, 15))   # cp state alone
    with pytest.raises(Exception, match="not in the log"):
        ks(versionAsOf="1")                            # retired json

    # stream from scratch: initial snapshot (cp live set) + commit 3,
    # no ignoreDeletes needed — the v2 delete predates the checkpoint
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("delta_jarless").option("path", src)
             .load().writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return sorted(x.k for x in spark.read.parquet(out).collect())

    assert drain() == list(range(5, 20))
    t.append(spark.range(20, 22).selectExpr("id AS k"))      # v4
    assert drain() == list(range(5, 22))   # restart serves ONLY v4

    # multi-part: split the single-part checkpoint into 2 parts
    single = os.path.join(log, f"{2:020d}.checkpoint.parquet")
    full = pq.read_table(single)
    os.remove(single)
    half = max(1, full.num_rows // 2)
    pq.write_table(full.slice(0, half), os.path.join(
        log, f"{2:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(full.slice(half), os.path.join(
        log, f"{2:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    assert ks(versionAsOf="2") == list(range(5, 15))
    assert ks() == list(range(5, 22))

    # v2 uuid-named checkpoint only (top-level parquet form, no
    # sidecars): resolved like a classic one (VERDICT r13 #3)
    src2 = str(tmp_path / "cpt2")
    shutil.copytree(src, src2)
    log2 = os.path.join(src2, "_delta_log")
    for n in os.listdir(log2):
        if ".checkpoint." in n:
            os.remove(os.path.join(log2, n))
    pq.write_table(full, os.path.join(
        log2, f"{2:020d}.checkpoint."
        f"12345678-1234-1234-1234-123456789abc.parquet"))

    def ks2(**opts):
        r = spark.read.format("delta_jarless").option("path", src2)
        for key, val in opts.items():
            r = r.option(key, val)
        return sorted(x.k for x in r.load().select("k").collect())

    assert ks2() == list(range(5, 22))
    assert ks2(versionAsOf="2") == list(range(5, 15))


def test_delta_jarless_v2_checkpoint_sidecars(spark, tmp_path):
    """VERDICT r13 #3: a REAL v2 uuid-named checkpoint (json top-level
    with checkpointMetadata/protocol/metaData + parquet SIDECARS under
    _delta_log/_sidecars/, written by write_v2_checkpoint) replays in
    the jarless datasource after log cleanup retires the json prefix:
    batch reads at and below the checkpoint version, and a fresh stream
    serves the checkpoint live set as the INITIAL SNAPSHOT batch."""
    import json as _json
    import os

    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from databricks_import_pyspark_scripts_spark.delta import DeltaTable
    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        replay_log,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "v2cpt")
    t = DeltaTable.create(spark, spark.range(10).selectExpr("id AS k"),
                          src)
    t.append(spark.range(10, 15).selectExpr("id AS k"))      # v1
    t.delete("k < 5")                                        # v2
    # manual protocol upgrade declaring v2Checkpoint (v3 of the log)
    rep = replay_log(spark, src)
    feats = sorted(set((rep.protocol.get("writerFeatures") or []))
                   | {"v2Checkpoint"})
    rfeats = sorted(set((rep.protocol.get("readerFeatures") or []))
                    | {"v2Checkpoint"})
    log = os.path.join(src, "_delta_log")
    with open(os.path.join(log, f"{rep.version + 1:020d}.json"),
              "w") as f:
        f.write(_json.dumps({"commitInfo": {
            "timestamp": 3000, "operation": "UPGRADE"}}) + "\n")
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": rfeats, "writerFeatures": feats}}) + "\n")
    assert t.checkpoint_v2() == 3
    t.append(spark.range(15, 20).selectExpr("id AS k"))      # v4
    names = os.listdir(log)
    assert any(".checkpoint." in n and n.endswith(".json")
               for n in names)
    assert os.listdir(os.path.join(log, "_sidecars"))
    for v in range(4):                                 # log cleanup
        os.remove(os.path.join(log, f"{v:020d}.json"))

    def ks(**opts):
        r = spark.read.format("delta_jarless").option("path", src)
        for key, val in opts.items():
            r = r.option(key, val)
        return sorted(x.k for x in r.load().select("k").collect())

    assert ks() == list(range(5, 20))
    assert ks(versionAsOf="3") == list(range(5, 15))   # cp state alone
    with pytest.raises(Exception, match="not in the log"):
        ks(versionAsOf="1")                            # retired json

    # fresh stream: initial snapshot from the v2 checkpoint + commit 4
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (spark.readStream.format("delta_jarless").option("path", src)
         .load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted(x.k for x in spark.read.parquet(out).collect())
    assert got == list(range(5, 20))


def test_delta_jarless_mid_stream_data_loss(spark, tmp_path):
    """ADVICE r13 #1: a RESTART whose offset sits mid-history must NOT
    re-serve the checkpoint live set when the commits after it were
    retired — rows from commits <= the offset were already delivered.
    The source raises a data-loss error (Delta-source behavior);
    failOnDataLoss=false opts into skipping the missing commits."""
    import os

    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from databricks_import_pyspark_scripts_spark.delta import DeltaTable
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "loss")
    t = DeltaTable.create(spark, spark.range(10).selectExpr("id AS k"),
                          src)
    t.append(spark.range(10, 15).selectExpr("id AS k"))      # v1
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain(**opts):
        reader = (spark.readStream.format("delta_jarless")
                  .option("path", src))
        for key, val in opts.items():
            reader = reader.option(key, val)
        q = (reader.load().writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return sorted(x.k for x in spark.read.parquet(out).collect())

    assert drain() == list(range(15))       # stream offset now 1
    t.append(spark.range(15, 18).selectExpr("id AS k"))      # v2
    assert t.checkpoint() == 2
    log = os.path.join(src, "_delta_log")
    for v in range(3):                      # cleanup retires 0..2
        os.remove(os.path.join(log, f"{v:020d}.json"))
    t.append(spark.range(18, 20).selectExpr("id AS k"))      # v3

    # restart at offset 1: commit 2 is gone — loud data-loss error,
    # NOT a checkpoint re-serve (which would duplicate 0..14)
    with pytest.raises(StreamingQueryException,
                       match="retired by log cleanup"):
        drain()
    # the opt-in skips commit 2 (its rows are lost) and serves v3 only
    got = drain(failOnDataLoss="false")
    assert got == list(range(15)) + list(range(18, 20))


def test_delta_jarless_field_id_fallback_and_dv_filter(tmp_path):
    """Unit test of the executor-side file read (no Spark): a FOREIGN
    id-mode file whose column NAMES share nothing with the physical
    names resolves by parquet field id; a missing column with no id
    raises loudly; the DV mask drops in-file positions; partition values
    parse per Delta's string serialization."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from databricks_import_pyspark_scripts_spark.sources.delta_dv import (
        serialize_bitmap_array,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        _FilePartition,
        _pv_python,
        _read_file_partition,
    )

    path = str(tmp_path / "zz.parquet")
    pq.write_table(pa.table(
        {"zz-1": pa.array([0, 1, 2, 3], pa.int64()),
         "zz-2": pa.array([0.0, 1.0, 2.0, 3.0], pa.float64())},
        schema=pa.schema([
            pa.field("zz-1", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("zz-2", pa.float64(),
                     metadata={b"PARQUET:field_id": b"2"})])), path)

    import numpy as np
    part = _FilePartition(
        path=path,
        data_cols=[("k", "col-p1", 1, "long"),
                   ("v", "col-p2", 2, "double")],
        part_vals=[("part", "x", "string"), ("d", "2024-03-05", "date")],
        dv_blob=serialize_bitmap_array(np.array([1, 3], np.int64)),
        field_order=["k", "v", "part", "d"])
    out = pa.Table.from_batches(list(_read_file_partition(part)))
    assert out.column_names == ["k", "v", "part", "d"]
    assert out.column("k").to_pylist() == [0, 2]       # DV dropped 1, 3
    assert out.column("part").to_pylist() == ["x", "x"]
    assert out.column("d").to_pylist() == [datetime.date(2024, 3, 5)] * 2

    bad = _FilePartition(path=path,
                         data_cols=[("w", "col-p9", None, "long")],
                         part_vals=[], dv_blob=None, field_order=["w"])
    with pytest.raises(ValueError, match="absent from the file"):
        list(_read_file_partition(bad))

    # partition-value parsing table (Delta protocol serialization)
    assert _pv_python(None, "long") is None
    assert _pv_python("42", "long") == 42
    assert _pv_python("true", "boolean") is True
    assert _pv_python("1.5", "double") == 1.5
    assert _pv_python("2021-01-01 00:00:00",
                      "timestamp") == datetime.datetime(2021, 1, 1)
    with pytest.raises(ValueError, match="unsupported partition"):
        _pv_python("x", "binary")


def test_batch_read_format_delta_jarless(spark, tmp_path):
    """spark.read.format("delta_jarless"): the batch half of the format —
    live-file snapshot at head or versionAsOf, file-aligned deletes
    reflected, DV-bearing files filtered through their shipped bitmaps
    (VERDICT r12 #4 — plan-time rejection removed)."""
    import pyspark

    if tuple(int(x) for x in pyspark.__version__.split(".")[:2]) < (4, 0):
        pytest.skip("Python Data Source API needs Spark 4")

    from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
        append_delta,
        create_delta_table,
        delete_where,
    )
    from databricks_import_pyspark_scripts_spark.sources.delta_stream_datasource import (
        register_delta_stream_source,
    )

    register_delta_stream_source(spark)
    src = str(tmp_path / "t")
    create_delta_table(spark, spark.range(0, 10).selectExpr(
        "id AS k", "CAST(id AS double) AS v").coalesce(1), src)   # v0
    append_delta(spark, spark.range(10, 15).selectExpr(
        "id AS k", "CAST(id AS double) AS v").coalesce(1), src)   # v1
    delete_where(spark, src, "k < 10")                            # v2

    def rd(**opts):
        r = spark.read.format("delta_jarless").option("path", src)
        for key, val in opts.items():
            r = r.option(key, val)
        return sorted(x.k for x in r.load().select("k").collect())

    assert rd() == list(range(10, 15))                  # head: post-delete
    assert rd(versionAsOf="1") == list(range(15))       # time travel
    assert rd(versionAsOf="0") == list(range(10))
    with pytest.raises(Exception, match="not in the log"):
        rd(versionAsOf="9")

    # column pruning reaches the pyarrow read: a projected load works
    one_col = (spark.read.format("delta_jarless").option("path", src)
               .load().select("v"))
    assert len(one_col.collect()) == 5

    # DV-bearing table reads THROUGH the bitmap (VERDICT r12 #4): the
    # planner ships each file's compressed DV; the executor read drops
    # the dead in-file positions
    dv = str(tmp_path / "dv")
    create_delta_table(spark, spark.range(0, 10).selectExpr(
        "id AS k", "CAST(id AS double) AS v"), dv)
    delete_where(spark, dv, "k = 3", use_dv=True)
    got = sorted(r.k for r in spark.read.format("delta_jarless")
                 .option("path", dv).load().collect())
    assert got == [k for k in range(10) if k != 3]
