"""Record linkage / entity resolution: blocked pairwise matching with
edit-distance scoring.

The classic ER pipeline shape — cheap BLOCKING key to bound the candidate
space, then an expensive pairwise similarity only within blocks — expressed
as a self-join on the block key. At 100 TB the block key is the shuffle key:
candidates are generated per-block (never a global cross join), blocks are
independent (perfectly parallel), and a skewed mega-block is the one hazard
— bound it with a block-size cap (same guard contract as
operators/dedup.bucket_pairs) or refine the key (add a second column) before
running the quadratic inner loop.

``levenshtein`` is a JVM built-in in Spark (no Python in the hot path) and a
native function in DuckDB, with the identical classical definition — the
pair scores are integer-exact across the oracle boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LINKAGE_MAX_DIST = 1  # default edit-distance match threshold


def blocked_candidate_pairs(records: DataFrame, id_col: str,
                            block_cols: list[str]) -> DataFrame:
    """Within-block candidate pairs (a < b by id). Each side carries its
    non-block columns suffixed _a/_b; the block columns stay unsuffixed."""
    others = [c for c in records.columns if c not in block_cols]
    a = records.select(
        *block_cols, *[F.col(c).alias(f"{c}_a") for c in others])
    b = records.select(
        *block_cols, *[F.col(c).alias(f"{c}_b") for c in others])
    return a.join(b, block_cols).filter(
        F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))


def edit_distance_matches(records: DataFrame, id_col: str, name_col: str,
                          block_cols: list[str],
                          max_dist: int = LINKAGE_MAX_DIST) -> DataFrame:
    """Blocked fuzzy-match pairs: same block, levenshtein(name_a, name_b)
    <= max_dist. Returns (block_cols..., id_a, id_b, name_a, name_b, dist).

    The quadratic-within-block baseline; prefer
    :func:`deletion_neighborhood_matches` when max_dist == 1 — identical
    output, near-linear candidate generation.
    """
    pairs = blocked_candidate_pairs(records, id_col, block_cols)
    dist = F.levenshtein(F.col(f"{name_col}_a"), F.col(f"{name_col}_b"))
    return (pairs
            .withColumn("dist", dist)
            .filter(F.col("dist") <= max_dist)
            .select(*block_cols,
                    F.col(f"{id_col}_a").alias("id_a"),
                    F.col(f"{id_col}_b").alias("id_b"),
                    F.col(f"{name_col}_a").alias("name_a"),
                    F.col(f"{name_col}_b").alias("name_b"),
                    "dist"))


def deletion_variants_col(name: Column) -> Column:
    """The FastSS delete-1 neighborhood of a string as an array: the string
    itself plus every single-character-deleted variant. Two strings are
    within edit distance 1 iff their neighborhoods intersect (deleting the
    edited position from whichever side carries it yields a common string;
    position-free intersection can overgenerate — e.g. 'ab'/'ba' — which
    the levenshtein verify step removes)."""
    n = F.length(name)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(name.substr(F.lit(1), i - 1),
                           name.substr(i + 1, n)))
    return F.when(n >= 1, F.concat(F.array(name), dels)).otherwise(
        F.array(name))


def deletion_neighborhood_matches(records: DataFrame, id_col: str,
                                  name_col: str,
                                  block_cols: list[str]) -> DataFrame:
    """Exact equivalent of ``edit_distance_matches(..., max_dist=1)`` with
    near-linear candidate generation: explode each record into its ~(len+1)
    delete-1 neighborhood keys, equi-join on (block, key), dedup the pair,
    then verify with one levenshtein call per candidate pair.

    Scale shape: no quadratic block self-join — the shuffle key is
    (block, neighborhood-key), so cost tracks matches + overgenerated
    candidates, not block-size². The quadratic baseline degrades with the
    square of the largest block (the classic ER skew hazard); this path
    only degrades on heavy duplicate mass of a single name, which the
    pair-distinct collapses before verification.
    """
    name = F.col(name_col)
    ex = records.select(
        *block_cols, F.col(id_col), name,
        F.explode(deletion_variants_col(name)).alias("nk"))
    a = ex.select(*block_cols, F.col(id_col).alias("id_a"),
                  F.col(name_col).alias("name_a"), "nk")
    b = ex.select(*block_cols, F.col(id_col).alias("id_b"),
                  F.col(name_col).alias("name_b"), "nk")
    cand = (a.join(b, [*block_cols, "nk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select(*block_cols, "id_a", "id_b", "name_a", "name_b")
            .distinct())
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") <= 1)
            .select(*block_cols, "id_a", "id_b", "name_a", "name_b", "dist"))
