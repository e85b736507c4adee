"""Connected components by iterative min-label propagation — the fixpoint
behind near-duplicate CLUSTERING (docs joined by any chain of near-dup pairs
collapse to one canonical representative).

The driver loop iterates DataFrame plans (never collects data): each round,
every vertex adopts the minimum label among itself and its neighbors;
convergence when no label changes. Rounds needed = graph diameter (tiny for
near-dup clusters); each round is one join + one aggregation on vertex id.
For web-scale graphs swap in the large-star/small-star variant — the same
join/agg primitives, fewer rounds. Checkpointing truncates the lineage so
round N's plan doesn't replay rounds 1..N-1.

The fixpoint (min reachable id per vertex) is unique, so results are
deterministic regardless of iteration order — which is what lets the gate
check this iterative algorithm against a DuckDB recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(vertices: DataFrame, edges: DataFrame,
                         id_col: str = "id", src_col: str = "src",
                         dst_col: str = "dst", max_iter: int = 20) -> DataFrame:
    """(id, component): component = min vertex id reachable from ``id``.

    ``edges`` are undirected (symmetrized internally).
    """
    spark = vertices.sparkSession
    sc = spark.sparkContext
    if not sc.getCheckpointDir():
        sc.setCheckpointDir("/tmp/spark_graft_checkpoints")
    sym = (edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
           .unionByName(
               edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
           .distinct()
           # materialize once: the edge list may be an expensive pipeline
           # (e.g. the MinHash candidate join) and is reused every round
           .checkpoint(eager=True))
    labels = vertices.select(F.col(id_col).alias("id"),
                             F.col(id_col).alias("component"))
    for it in range(max_iter):
        nbr_min = (sym.join(labels, sym.b == labels.id)
                   .groupBy("a").agg(F.min("component").alias("nbr_component")))
        # The convergence probe rides the SAME job that materializes the
        # round's checkpoint: labels only ever decrease, so "changed" is
        # (new < old) computed where old is still in scope, and observe()
        # sums the flags in an accumulator during the checkpoint action —
        # one job per round, where the earlier shape ran a second full
        # old-vs-new join+count job per round just to ask "done yet?".
        obs = Observation(f"cc_round_{it}")
        new_labels = (labels.join(nbr_min, labels.id == nbr_min.a, "left")
                      .select("id",
                              F.least("component",
                                      F.coalesce("nbr_component", "component"))
                              .alias("component"),
                              (F.coalesce("nbr_component", "component")
                               < F.col("component")).cast("long")
                              .alias("changed")))
        new_labels = (new_labels
                      .observe(obs, F.sum("changed").alias("n_changed"))
                      .drop("changed")
                      .checkpoint(eager=True))
        labels = new_labels
        if not obs.get["n_changed"]:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within max_iter={max_iter} "
        f"rounds (graph diameter exceeds the budget) — returning would "
        f"silently split true components; raise max_iter or switch to the "
        f"large-star/small-star variant for high-diameter graphs")
