"""Checkpoint-storage lifetime control.

Several operators eagerly ``localCheckpoint`` internal artifacts because
they have multiple consumers or iterative round loops (BM25's inverted
index, SemDeDup's cell assignment, k-core's peel rounds, BPE's vocab,
corpus-prep's survivor set). A localCheckpoint pins MEMORY_AND_DISK blocks
for the life of the session — correct for build-once/query-forever
artifacts, but a long-lived session that runs MANY such operators
accumulates pinned blocks until driver GC happens to collect the RDD
objects (measured: +2-5 pinned RDDs per k-core invocation; the bench
harness saw multi-second run-to-run drift from the accumulation before it
started dropping leftovers between queries).

``checkpoint_scope`` is the production-facing form of that hygiene: a
context manager that snapshots the persistent-RDD set on entry and
unpersists everything NEW on exit, so a batch job can wrap each logical
unit of work and leave the session storage-clean::

    with checkpoint_scope(spark):
        flags = semdedup_flags(vectors, centroids)
        flags.write.parquet(out)          # consume INSIDE the scope

Anything checkpointed inside the scope is INVALID after exit (its lineage
was truncated to exactly those blocks — that is what a checkpoint is), so
materialize results to storage or driver memory before leaving. Scopes
nest: an inner scope only drops blocks created inside itself.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of currently-persisted RDDs (includes localCheckpoint blocks)."""
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    return set(jsc.getPersistentRDDs().keySet().toArray())


def unpersist_rdds(spark: SparkSession, rdd_ids: set[int],
                   blocking: bool = False) -> int:
    """Unpersist the given RDD ids; returns how many were found and
    dropped. Missing ids (already collected) are skipped silently."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()  # noqa: SLF001
    dropped = 0
    for rid in rdd_ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(blocking)
            dropped += 1
    return dropped


@contextmanager
def checkpoint_scope(spark: SparkSession, blocking: bool = False):
    """Drop every RDD persisted inside the ``with`` body on exit."""
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        unpersist_rdds(spark, persistent_rdd_ids(spark) - before, blocking)
