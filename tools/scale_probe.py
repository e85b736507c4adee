#!/usr/bin/env python
"""One-off sf0.1 -> sf1 scaling probe for the heavy extension tier
(VERDICT r9 item 8): measures each gate's wall time at sf0.1 and at a
synthesized 10x corpus, and reports the per-query scaling exponent
n = log(t_10x / t_1x) / log(10)  (t ~ N^n; n<=1 is linear or better).

The 10x corpus is DERIVED from /root/testdata/sf0.1 (never written back
there): replicas are made statistically similar but NOT byte-identical —
verbatim copies would turn every document into a 10-member exact-dup
cluster and measure the dedup operators against a degenerate corpus:

* documents: doc_id shifted per replica; every word suffixed with the
  replica tag, so replicas share NO shingles/tokens (each replica is an
  independent corpus of the same shape — vocabulary scales with N the
  way real corpora roughly do);
* embeddings: vec_id shifted; small deterministic per-replica noise so
  ANN/SemDeDup never see exact duplicate vectors;
* customer: c_custkey shifted, c_name regenerated from the new key
  (TPC-H's own Customer#%09d shape), so FastSS blocking density stays
  what it is at sf0.1.

Usage:  python tools/scale_probe.py [--runs 2] [--out /tmp/scale_probe.json]
Run it ALONE — any concurrent Spark job distorts the numbers
(SCALE.md "variance").
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
SYNTH = "/tmp/spark_graft_sf1_synth"
REPLICAS = 10

HEAVY = [
    "dedup_containment_pairs",
    "dedup_incremental_neardup",
    "similarity_topk_ivfpq",
    "graph_kcore",
    "graph_pagerank_exact",
    "tokenizer_bpe_encode",
    "dedup_semantic_semdedup",
    "corpus_prep_pipeline_v2",
    "text_bm25_search",
    "text_duplicate_passages",
]


def build_synth() -> None:
    if os.path.exists(os.path.join(SYNTH, "_READY")):
        return
    import shutil

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(SYNTH, ignore_errors=True)
    os.makedirs(SYNTH)
    con = duckdb.connect()

    # documents: word-suffix per replica -> disjoint token/shingle spaces
    parts = []
    for i in range(REPLICAS):
        parts.append(f"""
        SELECT doc_id + {i} * 1000000 AS doc_id,
               regexp_replace(text, '(\\S+)', '\\1x{i}', 'g') AS text,
               lang, source, n_chars
        FROM read_parquet('{SF_DIR}/documents.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{SYNTH}/documents.parquet' (FORMAT PARQUET)")

    # embeddings: shifted ids + deterministic per-replica noise
    tb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = tb.column("vec_id").to_numpy()
    labels = tb.column("label").to_numpy()
    vecs = np.array(tb.column("embedding").to_pylist(), dtype=np.float32)
    out_ids, out_vecs, out_labels = [], [], []
    for i in range(REPLICAS):
        rng = np.random.default_rng(4242 + i)
        noise = (rng.standard_normal(vecs.shape).astype(np.float32)
                 * (0.0 if i == 0 else 0.01))
        out_ids.append(ids + i * 1000000)
        out_vecs.append(vecs + noise)
        out_labels.append(labels)
    allv = np.concatenate(out_vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
        "embedding": pa.array(list(allv), pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(out_labels), pa.int32()),
    }), f"{SYNTH}/embeddings.parquet")

    # customer: shifted keys, names regenerated in the TPC-H shape
    parts = []
    for i in range(REPLICAS):
        parts.append(f"""
        SELECT c_custkey + {i} * 10000000 AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + {i} * 10000000 AS
                                        VARCHAR), 9, '0') AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{SF_DIR}/customer.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{SYNTH}/customer.parquet' (FORMAT PARQUET)")
    open(os.path.join(SYNTH, "_READY"), "w").close()


def probe(spark, queries: list[str] | None = None, runs: int = 2,
          progress: bool = False) -> dict[str, dict]:
    """Measure each query at sf0.1 and the synthesized 10x corpus and
    return {name: {"sf0.1": s, "sf1": s, "exponent": n}} (errors record
    a string instead). Importable — bench.py runs this as the standing
    per-round exponent tier (VERDICT r10 #8)."""
    build_synth()

    from databricks_import_pyspark_scripts_spark.operators.lineage import (
        persistent_rdd_ids,
        unpersist_rdds,
    )
    from databricks_import_pyspark_scripts_spark.querylib import (
        REGISTRY, _load,
    )

    _load()
    base_rdds = persistent_rdd_ids(spark)
    results: dict[str, dict] = {}
    for name in queries or HEAVY:
        fn = REGISTRY[name].spark_fn
        row: dict = {}
        for tag, d in (("sf0.1", SF_DIR), ("sf1", SYNTH)):
            try:
                fn(spark, d).count()           # warm-up + cache staging
                best = math.inf
                for _ in range(runs):
                    t0 = time.time()
                    fn(spark, d).count()
                    best = min(best, time.time() - t0)
                row[tag] = round(best, 3)
            except Exception as ex:  # noqa: BLE001 — record, keep probing
                row[tag] = f"{type(ex).__name__}: {str(ex)[:200]}"
            finally:
                unpersist_rdds(spark, persistent_rdd_ids(spark) - base_rdds)
        if isinstance(row.get("sf0.1"), float) and \
                isinstance(row.get("sf1"), float) and row["sf0.1"] > 0:
            row["exponent"] = round(
                math.log(row["sf1"] / row["sf0.1"]) / math.log(REPLICAS), 3)
        results[name] = row
        if progress:
            print(json.dumps({name: row}), flush=True)
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/scale_probe.json")
    ap.add_argument("--queries", nargs="*", default=HEAVY)
    args = ap.parse_args()

    from databricks_import_pyspark_scripts_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = probe(spark, args.queries, runs=args.runs, progress=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"probe": "done", "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
