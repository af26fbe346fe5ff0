"""Blocked fuzzy record linkage (edit-distance joins without a cross join).

Not in the reference (udata-hydra links resources by exact ids only);
first-class here because catalog/entity cleanup — the "same part, typo'd
name" problem — is a standard lake workload, and the naive formulation is
an O(N²) cross join that never survives scale.

The classic record-linkage recipe (Fellegi-Sunter blocking): join ONLY
within a cheap deterministic block key (normalized prefix, first token,
soundex, length band…), then verify candidates with the expensive
similarity (Levenshtein here — a JVM built-in, `F.levenshtein`). Work
drops from N² to Σ_b |block_b|²; the block key choice is the scale lever
and is the caller's domain knowledge, which is why it's a parameter and
not a heuristic.

At 100 TB: the join is a plain equi-join on the block key (shuffle or
broadcast as Catalyst chooses), the distance filter runs inside the join
stage, and skewed blocks are visible as skewed join keys (AQE skew
handling or a tighter block key both apply unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    block: Column | str,
    text_a: str,
    text_b: str,
    max_distance: int = 2,
) -> DataFrame:
    """Candidate pairs of `a` × `b` sharing a block key with
    ``levenshtein(text_a, text_b) <= max_distance``.

    `block` is a column name present in both sides or a Column expression
    computed on each side's text column by the caller beforehand. All of
    `a`'s and `b`'s columns survive (prefixed where they collide);
    a `dist` column is appended.
    """
    if isinstance(block, str):
        ka, kb = F.col(block), F.col(block)
    else:
        ka = kb = block
    left = a.withColumn("__bk", ka)
    right = b.withColumn("__bk", kb)
    overlap = set(left.columns) & set(right.columns) - {"__bk"}
    for c in overlap:
        right = right.withColumnRenamed(c, f"{c}_b")
    joined = left.join(right, on="__bk").drop("__bk")
    tb = f"{text_b}_b" if text_b in overlap else text_b
    dist = F.levenshtein(F.col(text_a), F.col(tb))
    return joined.withColumn("dist", dist.cast("long")).filter(
        F.col("dist") <= max_distance
    )


def self_fuzzy_matches(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_distance: int = 2,
) -> DataFrame:
    """Self-linkage: unordered pairs (id_a < id_b) of rows within
    `max_distance` edits inside the same block — the fuzzy analogue of
    `dedup.duplicate_groups`. Returns (id_a, id_b, text_a, text_b, dist).
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t"), block.alias("__bk")
    )
    x, y = base.alias("x"), base.alias("y")
    dist = F.levenshtein(F.col("x.t"), F.col("y.t"))
    return (
        x.join(
            y,
            (F.col("x.__bk") == F.col("y.__bk")) & (F.col("x.id") < F.col("y.id")),
        )
        .withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_distance)
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.t").alias("text_a"),
            F.col("y.t").alias("text_b"),
            "dist",
        )
    )
