"""Model-based randomized differential test for the jar-less Delta WRITER:
a seeded generator drives a random sequence of real writer operations
(append / overwrite / delete_where / update_where / merge_into — each
row-op randomly choosing the REWRITE or the DELETION-VECTOR physical
layout — optimize_delta / write_classic_checkpoint, with occasional
retired-json prefixes) against a plain-Python dict model of the table contents; after
EVERY operation the snapshot read-back must equal the model exactly, and
at the end two randomly chosen historical versions must equal their
archived models (time travel across the whole mixed history).

This exercises interactions the hand-written tests cannot enumerate:
merges over previously-optimized files, deletes into compacted state,
updates after checkpoint truncation, dataChange=false commits interleaved
with logical changes — across seeds."""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F

from databricks_import_pyspark_scripts_spark.sinks.delta_writer import (
    append_delta,
    replace_where,
    restore_delta,
    create_delta_table,
    delete_where,
    merge_into,
    optimize_delta,
    overwrite_delta,
    update_where,
    write_classic_checkpoint,
)
from databricks_import_pyspark_scripts_spark.sources.delta_log import (
    read_delta_snapshot,
    replay_log,
)

BASE_TS = 1700000000000


def _df(spark, rows: dict[int, float]):
    if not rows:
        return spark.createDataFrame([], "k long, v double")
    return spark.createDataFrame(sorted(rows.items()), "k long, v double")


def _read(spark, t, version=None) -> dict[int, float]:
    snap = read_delta_snapshot(spark, t, version=version)
    return {r.k: r.v for r in snap.collect()}


@pytest.mark.parametrize("seed", [11, 47])
def test_writer_random_ops_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"m{seed}")

    next_id = 100
    model: dict[int, float] = {k: float(k) for k in range(20)}
    create_delta_table(spark, _df(spark, model), t, cdf=True, ts_ms=BASE_TS)
    history: dict[int, dict[int, float]] = {0: dict(model)}
    version = 0
    prev_version = 0

    def fresh_rows(n: int) -> dict[int, float]:
        nonlocal next_id
        rows = {k: float(k) * 1.5 for k in range(next_id, next_id + n)}
        next_id += n
        return rows

    ops = ["append", "delete", "update", "merge", "optimize",
           "checkpoint", "overwrite", "replace_where", "restore"]
    weights = [4, 3, 3, 3, 2, 2, 1, 2, 1]
    for step in range(12):
        op = rng.choices(ops, weights)[0]
        ts = BASE_TS + (step + 1) * 1000
        if op == "append":
            rows = fresh_rows(rng.randint(0, 8))
            v = append_delta(spark, _df(spark, rows), t, ts_ms=ts)
            model.update(rows)
            version = v
        elif op == "delete":
            m, r = rng.randint(2, 7), rng.randint(0, 1)
            v = delete_where(spark, t, f"k % {m} = {r}", ts_ms=ts,
                             use_dv=rng.random() < 0.4)
            doomed = [k for k in model if k % m == r]
            if doomed:
                for k in doomed:
                    del model[k]
                version = v
            else:
                assert v == version  # no match -> no commit
        elif op == "update":
            c = rng.randint(1, 50) * 10.0
            if rng.random() < 0.35 and model:
                # SELF-REFERENTIAL: the SET column appears in the WHERE
                # clause (the shape that exposed the r11 postimage-CDC
                # bug — the hit set must bind to PRE-update values)
                thr = rng.choice(sorted(model.values()))
                v = update_where(spark, t, f"v <= {thr}",
                                 {"v": f"v + {c}"}, ts_ms=ts,
                                 use_dv=rng.random() < 0.4)
                hit = [k for k, val in model.items() if val <= thr]
            else:
                m, r = rng.randint(2, 7), rng.randint(0, 1)
                v = update_where(spark, t, f"k % {m} = {r}",
                                 {"v": f"v + {c}"}, ts_ms=ts,
                                 use_dv=rng.random() < 0.4)
                hit = [k for k in model if k % m == r]
            if hit:
                for k in hit:
                    model[k] += c
                version = v
            else:
                assert v == version
        elif op == "merge":
            existing = rng.sample(sorted(model), min(len(model), 4)) \
                if model else []
            inserts = fresh_rows(rng.randint(0, 3))
            src = {k: float(k) + 0.25 for k in existing} | inserts
            if not src:
                continue
            v = merge_into(spark, t, _df(spark, src), on=["k"],
                           when_matched_update={"v": "t.v + s.v"},
                           ts_ms=ts, use_dv=rng.random() < 0.4)
            for k in existing:
                model[k] += float(k) + 0.25
            model.update(inserts)
            version = v
        elif op == "optimize":
            v = optimize_delta(spark, t, ts_ms=ts)
            version = max(version, v)  # may be a no-op
        elif op == "checkpoint":
            cp = write_classic_checkpoint(spark, t)
            if rng.random() < 0.5:
                # retire the json prefix: replay must come from the
                # checkpoint alone (historical versions below cp die —
                # drop them from the archive)
                for hv in range(cp):
                    p = os.path.join(t, "_delta_log", f"{hv:020d}.json")
                    if os.path.exists(p):
                        os.unlink(p)
                    history.pop(hv, None)
        elif op == "replace_where":
            m, r = rng.randint(2, 5), rng.randint(0, 1)
            pool = fresh_rows(rng.randint(4, 10))
            rows = {k: val for k, val in pool.items() if k % m == r}
            v = replace_where(spark, _df(spark, rows), t,
                              f"k % {m} = {r}", ts_ms=ts)
            model = {k: val for k, val in model.items()
                     if k % m != r} | rows
            version = v
        elif op == "restore":
            target = rng.choice(sorted(history))
            v = restore_delta(spark, t, target, ts_ms=ts)
            model = dict(history[target])
            version = max(version, v)  # identical state -> no commit
        else:  # overwrite
            rows = fresh_rows(rng.randint(1, 6))
            v = overwrite_delta(spark, _df(spark, rows), t, ts_ms=ts)
            model = dict(rows)
            version = v
        assert _read(spark, t) == model, f"seed={seed} step={step} op={op}"
        # CDC-reconstruction invariant: replaying version v's change
        # feed onto the previous state must reproduce the new state —
        # explicit cdc files and file-op synthesis must agree with the
        # snapshot for EVERY op (restore included: its DV-aware
        # file-diff synthesis emits exactly the resurrected/lost rows)
        # and never double-count rewritten files
        if version > prev_version:
            from databricks_import_pyspark_scripts_spark.sources.delta_log import (  # noqa: E501
                read_delta_changes,
            )
            rebuilt = dict(history[prev_version])
            # (prev_version, version] — the table_changes convention;
            # spans any interleaved dataChange=false commits, which
            # must contribute ZERO change rows
            rows = read_delta_changes(spark, t, prev_version,
                                      version).collect()
            for r in rows:
                if r._change_type in ("delete", "update_preimage"):
                    rebuilt.pop(r.k, None)
            for r in rows:
                if r._change_type in ("insert", "update_postimage"):
                    rebuilt[r.k] = r.v
            assert rebuilt == model, \
                f"seed={seed} step={step} op={op} v={version}: CDC " \
                f"replay diverges from the snapshot"
        prev_version = version
        history[version] = dict(model)

    # time travel: two random archived versions replay to their models
    for hv in rng.sample(sorted(history), min(len(history), 2)):
        assert _read(spark, t, version=hv) == history[hv], f"v={hv}"

    # the log itself is consistent, and any surviving DV descriptors are
    # well-formed (the rewrite ops FOLD prior DVs, the DV ops stack them
    # — both shapes appear across seeds)
    rep = replay_log(spark, t)
    assert set(_read(spark, t)) == set(model)
    for a in rep.files.values():
        dv = a.get("deletionVector")
        if dv is not None:
            assert dv["cardinality"] >= 1 and dv["sizeInBytes"] > 0


@pytest.mark.parametrize("seed", [7])
def test_identity_watermark_monotone_under_random_ops(spark, tmp_path,
                                                     seed):
    """Randomized identity-column invariants (VERDICT r10 #4): across a
    random append/merge/delete/update/optimize sequence where NO writer
    input ever carries the identity column, after EVERY op the stored
    values are unique, non-null, on the start/step grid, and the high
    watermark equals the stored maximum and never moves backward."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    rng = random.Random(seed)
    t = str(tmp_path / f"idm{seed}")
    START, STEP = 1000, 5
    schema = StructType([
        StructField("uid", LongType(), True,
                     {"delta.identity.start": START,
                      "delta.identity.step": STEP}),
        StructField("k", LongType()),
        StructField("v", DoubleType())])
    create_delta_table(
        spark, spark.createDataFrame(
            [(START + STEP * k, k, float(k)) for k in range(10)], schema),
        t, ts_ms=BASE_TS)
    next_id = 100
    last_wm = None
    keys = set(range(10))

    def check():
        nonlocal last_wm
        rows = read_delta_snapshot(spark, t).collect()
        uids = [r.uid for r in rows]
        assert all(u is not None for u in uids)
        assert len(set(uids)) == len(uids), "duplicate identity values"
        assert all((u - START) % STEP == 0 for u in uids)
        rep = replay_log(spark, t)
        wm = next(f for f in rep.schema.fields if f.name == "uid"
                  ).metadata["delta.identity.highWaterMark"]
        assert not uids or wm == max(uids)
        assert last_wm is None or wm >= last_wm, "watermark regressed"
        last_wm = wm
        assert {r.k for r in rows} == keys

    check()
    for step in range(8):
        ts = BASE_TS + (step + 1) * 1000
        op = rng.choices(["append", "merge", "delete", "update",
                          "optimize"], [3, 3, 2, 2, 1])[0]
        if op == "append":
            n = rng.randint(1, 5)
            fresh = list(range(next_id, next_id + n))
            next_id += n
            append_delta(spark, spark.createDataFrame(
                [(k, float(k)) for k in fresh], "k long, v double"),
                t, ts_ms=ts)
            keys |= set(fresh)
        elif op == "merge":
            existing = rng.sample(sorted(keys), min(len(keys), 3))
            n = rng.randint(0, 3)
            fresh = list(range(next_id, next_id + n))
            next_id += n
            src = [(k, float(k) + 0.5) for k in existing + fresh]
            if not src:
                continue
            merge_into(spark, t, spark.createDataFrame(
                src, "k long, v double"), on=["k"],
                when_matched_update={"v": "t.v + s.v"}, ts_ms=ts,
                use_dv=rng.random() < 0.4)
            keys |= set(fresh)
        elif op == "delete":
            m, r = rng.randint(2, 5), rng.randint(0, 1)
            delete_where(spark, t, f"k % {m} = {r}", ts_ms=ts,
                         use_dv=rng.random() < 0.4)
            keys = {k for k in keys if k % m != r}
        elif op == "update":
            m, r = rng.randint(2, 5), rng.randint(0, 1)
            update_where(spark, t, f"k % {m} = {r}", {"v": "v + 1"},
                         ts_ms=ts, use_dv=rng.random() < 0.4)
        else:
            optimize_delta(spark, t, ts_ms=ts)
        check()
