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

from pyspark.sql import DataFrame
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
