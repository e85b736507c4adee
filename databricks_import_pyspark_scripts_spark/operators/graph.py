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




def _truncate(df: DataFrame, reliable: bool) -> DataFrame:
    """Cut lineage between iterative rounds. Default is localCheckpoint:
    blocks pin to executor storage (MEMORY_AND_DISK) with no checkpoint-dir
    round-trip — markedly cheaper per round, and the right trade on
    dedicated clusters where an executor loss just fails-fast the job.
    Pass reliable=True (plumbed through the public operators as
    ``reliable_checkpoints``) on preemptible/spot fleets: a reliable
    checkpoint writes to the checkpoint dir (set it to durable storage via
    ``sc.setCheckpointDir``) and survives executor loss mid-algorithm.

    reliable=True REQUIRES a checkpoint dir to already be set: silently
    defaulting one (the pre-r7 behavior was /tmp/spark_graft_checkpoints)
    lands on node-local disk in most deployments, which does NOT survive
    the executor loss the flag exists to survive — a durability guarantee
    the code advertised but didn't provide.
    """
    if reliable:
        sc = df.sparkSession.sparkContext
        if not sc.getCheckpointDir():
            raise ValueError(
                "reliable_checkpoints=True requires an explicit checkpoint "
                "dir on durable shared storage — call "
                "spark.sparkContext.setCheckpointDir('s3a://...' or "
                "'hdfs://...') first. A local-disk default would not "
                "survive the executor loss this flag exists to survive.")
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(vertices: DataFrame, edges: DataFrame,
                         id_col: str = "id", src_col: str = "src",
                         dst_col: str = "dst", max_iter: int = 20,
                         reliable_checkpoints: bool = False) -> DataFrame:
    """(id, component): component = min vertex id reachable from ``id``.

    ``edges`` are undirected (symmetrized internally).
    """
    sym = _both_directions(edges, src_col, dst_col,
                           "a", "b").distinct()
    # materialize once: the edge list may be an expensive pipeline
    # (e.g. the MinHash candidate join) and is reused every round
    sym = _truncate(sym, reliable_checkpoints)
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
        new_labels = _truncate(
            new_labels.observe(obs, F.sum("changed").alias("n_changed"))
            .drop("changed"), reliable_checkpoints)
        labels = new_labels
        if not obs.get["n_changed"]:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within max_iter={max_iter} "
        f"rounds (graph diameter exceeds the budget) — returning would "
        f"silently split true components; raise max_iter or switch to the "
        f"large-star/small-star variant for high-diameter graphs")


def _both_directions(edges: DataFrame, src_col: str, dst_col: str,
                     out_a: str, out_b: str) -> DataFrame:
    """Emit each edge in both orientations in ONE pass over ``edges``.

    The union-of-two-projections form references ``edges`` twice, and when
    the edge list is an expensive pipeline (the ER candidate join, the
    MinHash pair join) the whole pipeline EXECUTES twice — exchange reuse
    only dedups identical exchange subtrees, not the post-shuffle
    projection/verify work above them. ``explode`` of the two orientations
    is row-identical to the union and scans the input once (r14,
    guide §2.4: remove duplicate passes outright)."""
    return edges.select(
        F.explode(F.array(
            F.struct(F.col(src_col).alias(out_a), F.col(dst_col).alias(out_b)),
            F.struct(F.col(dst_col).alias(out_a), F.col(src_col).alias(out_b)),
        )).alias("_e")).select("_e.*")


def _symmetric(edges: DataFrame) -> DataFrame:
    return (_both_directions(edges, "a", "b", "a", "b")
            .filter(F.col("a") != F.col("b")))


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond").

    For each node u with neighborhood G(u) and m = min(G(u) + {u}):
    large-star links every neighbor v > u to m; small-star links every
    v <= u in G(u) + {u} (except m itself) to m. One shuffle each (the
    groupBy and the join share the partitioning on u).
    """
    nbr = _symmetric(edges)
    mins = (nbr.groupBy("a")
            .agg(F.min("b").alias("_minb"))
            .select("a", F.least(F.col("a"), F.col("_minb")).alias("m")))
    j = nbr.join(mins, "a")
    if large:
        out = (j.filter(F.col("b") > F.col("a"))
               .select(F.col("b").alias("a"), F.col("m").alias("b")))
    else:
        tail = (j.filter(F.col("b") <= F.col("a"))
                .select(F.col("b").alias("a"), F.col("m").alias("b")))
        self_link = mins.select(F.col("a"), F.col("m").alias("b"))
        out = tail.unionByName(self_link)
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components_star(vertices: DataFrame, edges: DataFrame,
                              id_col: str = "id", src_col: str = "src",
                              dst_col: str = "dst",
                              max_iter: int = 30,
                              reliable_checkpoints: bool = False) -> DataFrame:
    """(id, component) via alternating large-star/small-star contraction —
    the O(log n)-round form of connected components for HIGH-DIAMETER
    graphs, where ``connected_components``'s per-round neighbor-min
    propagation needs diameter-many rounds (a path graph of length 10^6
    needs 10^6 rounds there, ~40 here: each alternation roughly halves
    tree heights, so rounds grow with log(diameter), not diameter).

    Same unique fixpoint (every node linked to its component minimum), so
    it is gate-checkable against the same recursive-CTE oracle. Each
    round is two star contractions, checkpointed; the convergence probe
    rides the checkpoint job via observe() on a (count, hash-sum) edge-set
    signature, and a stable signature is confirmed with one EXACT
    set-difference before returning (the signature alone is
    probabilistic; the confirmation makes termination exact).
    """
    e = _truncate(
        _symmetric(edges.select(F.col(src_col).alias("a"),
                                F.col(dst_col).alias("b"))).distinct(),
        reliable_checkpoints)
    prev_sig = None
    for it in range(max_iter):
        stepped = _star_round(_star_round(e, large=True), large=False)
        obs = Observation(f"cc_star_{it}")
        stepped = _truncate(stepped.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent and overflow-free (sum of hashes
            # trips ANSI long-overflow); xor-cancellation needs the SAME
            # edge twice, and the set is distinct
            F.bit_xor(F.xxhash64("a", "b")).alias("h")),
            reliable_checkpoints)
        sig = (obs.get["n"], obs.get["h"])
        if sig == prev_sig:
            # exact confirmation: signatures are probabilistic
            if (stepped.exceptAll(e).unionByName(e.exceptAll(stepped))
                    .limit(1).count() == 0):
                e = stepped
                break
        prev_sig = sig
        e = stepped
    else:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"max_iter={max_iter} alternations")
    roots = e.groupBy("a").agg(F.min("b").alias("root"))
    labels = vertices.select(F.col(id_col).alias("id"))
    return (labels.join(roots, labels.id == roots.a, "left")
            .select("id",
                    F.least(F.col("id"), F.coalesce("root", "id"))
                    .alias("component")))


PR_SCALE = 10 ** 12   # fixed-point PageRank scale (1.0 == 10^12)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping 0.85 as an exact rational
PR_ITERS = 2


def pagerank_exact(vertices: DataFrame, edges: DataFrame,
                   iters: int = PR_ITERS,
                   scale: int = PR_SCALE) -> DataFrame:
    """(id, pr): fixed-point integer PageRank after ``iters`` rounds —
    exact int64 arithmetic throughout, so the iterative algorithm is
    oracle-checkable (the same trick as the floor-mean k-means: floats
    would make the neighbor-sum order observable, and Spark aggregation
    order is nondeterministic).

    Semantics (undirected: edges are symmetrized like the CC operators):
    pr starts at ``scale`` (== 1.0); each round every vertex emits
    ``pr div degree`` to each neighbor, and new pr =
    ``(1-d)*scale + d * sum(contributions)`` with the damped term computed
    as ``(85 * sum) div 100`` — every div is exact integer floor division
    on non-negative values, so any engine agrees bit-for-bit. Isolated
    vertices hold the teleport mass ``(1-d)*scale``. The floor drift vs
    float PageRank is bounded by iters * (max_degree + 1) ulps of 1e-12 —
    irrelevant for ranking, essential for checkability.

    Scale shape per round: one shuffle to aggregate contributions on the
    destination id, degree computed once and joined back (both keyed on
    vertex id, AQE-planned). ``iters`` is small and the chain stays lazy;
    at many rounds, localCheckpoint per round exactly like
    ``min_label_propagation``.
    """
    # Deliberately LAZY: the whole unrolled chain is ONE action, so
    # Spark's exchange reuse dedups the (expensive) edge-pipeline subtrees
    # at runtime — the static plan shows the minhash edge feed repeated
    # per reference, but the executed plan runs it once. Measured at
    # sf0.1 (interleaved A/B): lazy 1.08s vs eager localCheckpoint 2.81s —
    # the checkpoint's job barrier + block write costs more than it saves
    # here. Contrast the round-LOOP operators (connected_components,
    # kcore_peel): their per-round convergence probes are separate jobs,
    # reuse cannot span jobs, so they genuinely need the checkpoint.
    sym = (_both_directions(edges, "src", "dst", "src", "dst")
           .filter(F.col("src") != F.col("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * scale) // PR_DAMP_DEN
    pr = vertices.select("id", F.lit(scale).cast("long").alias("pr"))
    for _ in range(iters):
        # SQL `div`, never floor(a/b): converting a >2^53 int64 to double
        # for `/` silently rounds, and these fixed-point values reach 1e17
        contrib = (sym.join(pr, sym.src == pr.id)
                   .join(deg, deg.id == sym.src)
                   .select(F.col("dst").alias("to_id"),
                           F.expr("pr div deg").alias("c")))
        sums = contrib.groupBy("to_id").agg(F.sum("c").alias("s"))
        pr = (vertices.join(sums, vertices.id == sums.to_id, "left")
              .select(
                  "id",
                  (F.lit(base)
                   + F.expr(f"({PR_DAMP_NUM} * coalesce(s, 0L)) "
                            f"div {PR_DAMP_DEN}")).alias("pr")))
    return pr


def degree_oriented_edges(edges: DataFrame,
                          group_col: str | None = None,
                          reliable_checkpoints: bool = False) -> DataFrame:
    """Re-orient unique undirected edges (src < dst) from lower- to
    higher-RANK endpoint, rank = (degree, id) — degrees per group when
    ``group_col`` is set (each group is an independent graph). Returns
    (*group, u, v, rank_v) with rank(u) < rank(v); rank_v is the struct
    (d, i) used to order wedge endpoints without re-joining degrees.

    This is THE hub mitigation for triangle counting: under id-orientation
    a hub with a small id keeps out-degree O(deg) and its wedge build goes
    quadratic; under degree-orientation the hub outranks its (mostly
    lower-degree) neighbors, so edges point INTO it and per-vertex oriented
    out-degree is bounded by O(sqrt(m)) / graph arboricity (Chiba-Nishizeki).
    Rank ties are impossible: ids are unique, so (degree, id) is a strict
    total order. One degree aggregate (map-side partial) + two id-keyed
    joins, AQE-broadcast when the degree table is small.
    """
    cols = [group_col] if group_col else []
    # materialize the unique-edge projection once: it is referenced by the
    # symmetrized degree build (x2) and both endpoint-rank joins, and the
    # input is typically an expensive candidate pipeline (the gate feeds
    # the blocked-ER match join here) — unmaterialized, the plan replays
    # it per reference with no exchange reuse
    e = _truncate(edges.select(*cols, "src", "dst"), reliable_checkpoints)
    sym = e.unionByName(
        e.select(*cols, F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = (sym.groupBy(*cols, "src")
           .agg(F.count(F.lit(1)).alias("_deg"))
           .withColumnRenamed("src", "_v"))
    ranked = (e
              .join(deg.select(*cols, F.col("_v").alias("src"),
                               F.col("_deg").alias("_deg_s")), [*cols, "src"])
              .join(deg.select(*cols, F.col("_v").alias("dst"),
                               F.col("_deg").alias("_deg_d")), [*cols, "dst"]))
    rank_s = F.struct(F.col("_deg_s").alias("d"), F.col("src").alias("i"))
    rank_d = F.struct(F.col("_deg_d").alias("d"), F.col("dst").alias("i"))
    src_first = rank_s < rank_d
    return ranked.select(
        *cols,
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(src_first, rank_d).otherwise(rank_s).alias("rank_v"))


def triangle_count(edges: DataFrame, group_col: str | None = None,
                   reliable_checkpoints: bool = False) -> DataFrame:
    """Triangles per group (or one global row with group_col=None) over a
    unique undirected edge list (src < dst per row). Each triangle is
    enumerated exactly once: with vertices ranked x < y < z by (degree, id),
    the wedge is built at the lowest-rank corner x as (y, z) and closed by
    the oriented edge y->z.

    Plan: degree aggregate + orientation (``degree_oriented_edges``), then
    two self-joins — wedge build on the shared low corner, left-semi
    closure probe. Degree orientation bounds per-vertex wedge fan-out by
    the oriented out-degree (<= O(sqrt(m))) instead of the raw degree, so
    a hub vertex no longer generates O(deg^2) wedges — the triangle SET is
    identical to id-orientation (it's the same triangles, found from a
    different corner), only the intermediate wedge volume changes.
    """
    cols = [group_col] if group_col else []
    # oriented edges feed three self-join sides; materialize once so the
    # orientation joins run a single time
    o = _truncate(degree_oriented_edges(edges, group_col,
                                        reliable_checkpoints),
                  reliable_checkpoints)
    e1 = o.select(*cols, F.col("u").alias("a"), F.col("v").alias("b"),
                  F.col("rank_v").alias("_rb"))
    e2 = o.select(*cols, F.col("u").alias("a"), F.col("v").alias("c"),
                  F.col("rank_v").alias("_rc"))
    e3 = o.select(*cols, F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = (e1.join(e2, [*cols, "a"])
              .filter(F.col("_rb") < F.col("_rc")))
    tris = wedges.join(e3, [*cols, "b", "c"], "left_semi")
    if group_col:
        return tris.groupBy(group_col).agg(
            F.count("*").alias("n_triangles"))
    return tris.agg(F.count("*").alias("n_triangles"))


def kcore_peel(edges: DataFrame, k: int = 2, rounds: int = 4,
               src_col: str = "src", dst_col: str = "dst",
               reliable_checkpoints: bool = False) -> DataFrame:
    """(node, degree): the subgraph surviving ``rounds`` of k-core peeling —
    each round SIMULTANEOUSLY removes every node whose current degree is
    below ``k`` (degree computed before any of the round's removals), the
    standard distributed k-core schedule. ``degree`` is the node's degree
    within the surviving subgraph. At the fixpoint this IS the k-core; the
    round bound is what makes the iterative algorithm oracle-checkable
    (the oracle unrolls the same fixed schedule as CTE stages), and the
    loop exits early once a round removes nothing — a no-op round chain,
    so early exit returns exactly the fixed-``rounds`` result.

    Scale shape: per round, one hash aggregate on node id (map-side
    partial) + two left-semi joins against the (small, shrinking) survivor
    id set — AQE broadcasts the survivor side long before the edge list
    would shuffle. Checkpointing truncates lineage so round N never
    replays rounds 1..N-1 (the edge pipeline itself may be an expensive
    candidate join). Edges must be unique undirected pairs; symmetrized
    and de-duplicated here.
    """
    sym = _truncate(
        _both_directions(edges, src_col, dst_col, "node", "nbr")
        .filter(F.col("node") != F.col("nbr"))
        .distinct(), reliable_checkpoints)
    alive = sym
    prev_n = None
    for it in range(rounds):
        surv = (alive.groupBy("node")
                .agg(F.count(F.lit(1)).alias("_deg"))
                .filter(F.col("_deg") >= k)
                .select("node"))
        obs = Observation(f"kcore_round_{it}")
        alive = _truncate(
            alive
            .join(surv, "node", "left_semi")
            .join(surv.select(F.col("node").alias("nbr")), "nbr",
                  "left_semi")
            .observe(obs, F.count(F.lit(1)).alias("n_edges")),
            reliable_checkpoints)
        n = obs.get["n_edges"]
        if n == prev_n:
            break  # fixpoint: the remaining rounds are no-ops
        prev_n = n
    return (alive.groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree")))
