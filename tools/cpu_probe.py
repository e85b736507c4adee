#!/usr/bin/env python
"""r14 probe: time named queries (warm-up + N samples, the bench's
count() methodology) AND record the process-tree CPU-seconds each sample
consumes — wall alone hides total-work regressions on a 32-core host
(guide §1: measure first; §1.2: the distributed algorithm's total work is
the 100 TB lever, not local wall).

Usage: python tools/cpu_probe.py [--sf DIR] [--runs N] [--noop] name...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from databricks_import_pyspark_scripts_spark.querylib import all_queries
from databricks_import_pyspark_scripts_spark.session import get_spark


def _tree_cpu() -> float:
    """utime+stime (sec) summed over this process and every descendant."""
    tick = os.sysconf("SC_CLK_TCK")
    procs = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            cpu = (int(parts[11]) + int(parts[12])) / tick
            procs[int(pid)] = (ppid, cpu)
        except OSError:
            continue
    me = os.getpid()
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack = 0.0, [me]
    while stack:
        p = stack.pop()
        if p in procs:
            total += procs[p][1]
            stack.extend(kids.get(p, []))
    return total


def main() -> int:
    args = sys.argv[1:]
    sf_dir, runs, noop, names = "/root/testdata/sf0.1", 3, False, []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--noop":
            noop = True; i += 1
        else:
            names.append(a); i += 1
    spark = get_spark("cpu_probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop_pd(it):
        yield from it
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers * 8).repartition(n_workers).mapInPandas(
        _noop_pd, "id long").count()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    from databricks_import_pyspark_scripts_spark.operators.lineage import (
        persistent_rdd_ids,
        unpersist_rdds,
    )
    base_rdds = persistent_rdd_ids(spark)
    qs = all_queries()
    for name in names:
        fn = qs[name]
        walls, cpus = [], []
        for r in range(runs + 1):  # first run is warm-up
            spark.sparkContext.setJobDescription(f"cpu_probe:{name}#{r}")
            c0, t0 = _tree_cpu(), time.monotonic()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t1, c1 = time.monotonic(), _tree_cpu()
            if r:
                walls.append(t1 - t0)
                cpus.append(c1 - c0)
            unpersist_rdds(spark, persistent_rdd_ids(spark) - base_rdds)
        print(f"RESULT {name} wall_min={min(walls):.3f} "
              f"walls={[round(w, 3) for w in walls]} "
              f"cpu={[round(c, 2) for c in cpus]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
