"""SparkSession construction with scale-appropriate defaults.

The reference relies on the ambient Databricks session
(``/root/reference/unload_databricks_data_to_s3.py:464``); here we own session
construction so the same code runs on a laptop (local[N]) and on a real
cluster. Every config below is a public Spark conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle parallelism default: on local[N] match cores; AQE coalesces down at
# runtime so a modest over-estimate is safe at any scale.
_DEFAULT_CONF: dict[str, str] = {
    # local mode is a single JVM: the driver heap IS executor memory. The
    # 1g default thrashes GC with 32 concurrent tasks (measured 10x
    # slowdowns on later queries in a session); only effective at session
    # creation time.
    "spark.driver.memory": "48g",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Pin per-file record cap globally (the reference sets it only on the
    # coalesce path — SURVEY.md §4 known-inefficiency #4).
    "spark.sql.files.maxRecordsPerFile": "100000",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "spark_graft", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so tests and
    bench share one code path; on a cluster, spark-submit supplies the master
    and this argument stays None without overriding it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        # an explicit cluster master from the environment wins; previously
        # the env var was CHECKED but never USED, so SPARK_MASTER=spark://…
        # silently ran the job on the submit host's local[*]
        master = os.environ.get("SPARK_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if not cpus:
            # Default to HALF the logical CPUs: on hyperthreaded/vCPU hosts,
            # local[all-logical] makes compute-bound stages (md5 loops, JIT
            # compilation) contend with their own sibling threads — measured
            # headline-bench totals on a 32-vCPU box: 16 threads 34.8 s,
            # 32 threads 47.9-117.9 s (the wide agg's codegen compile alone
            # degraded 7.6 s -> 22-52 s under 32-thread contention).
            # An explicit SPARK_GRAFT_CPUS always wins.
            cpus = str(max(1, (os.cpu_count() or 2) // 2))
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
