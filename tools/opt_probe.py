#!/usr/bin/env python
"""r14 optimization probe: time named queries (warm-up + min-of-N, the
bench's methodology) and dump their .explain("formatted") plans.

Usage:
  python tools/opt_probe.py [--sf DIR] [--runs N] [--noop] [--plan TAG] name...

--noop times df.write.format("noop") instead of count() (guide §1.4) — used
for isolating compute when a count() could prune; the bench's own timed
action stays count() for round-over-round comparability.
--plan TAG additionally writes plans/r14/<name>_<TAG>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from databricks_import_pyspark_scripts_spark.querylib import all_queries
from databricks_import_pyspark_scripts_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs, noop, plan_tag = 3, False, None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--noop":
            noop = True; i += 1
        elif a == "--plan":
            plan_tag = args[i + 1]; i += 2
        else:
            names.append(a); i += 1
    spark = get_spark("opt_probe")
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
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = fn(spark, sf_dir)
        if plan_tag:
            os.makedirs("/root/repo/plans/r14", exist_ok=True)
            with open(f"/root/repo/plans/r14/{name}_{plan_tag}.txt", "w") as f:
                f.write(df._sc is not None and "" or "")  # noqa: keep lint quiet
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        samples = []
        try:
            # warm-up (untimed), then timed runs — bench methodology
            def _run():
                d = fn(spark, sf_dir)
                if noop:
                    d.write.format("noop").mode("overwrite").save()
                else:
                    d.count()
            _run()
            for _ in range(runs):
                t0 = time.time()
                _run()
                samples.append(round(time.time() - t0, 3))
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            continue
        finally:
            unpersist_rdds(spark, persistent_rdd_ids(spark) - base_rdds)
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print("FINAL " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
