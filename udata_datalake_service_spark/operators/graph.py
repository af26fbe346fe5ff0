"""Iterative graph analytics: PageRank over an edge list.

Third member of the iterative plane next to the dedup connected
components (``llm/dedup.near_dup_clusters``) and deterministic k-means
(``llm/similarity.kmeans_fit``), sharing their harness contract: a
driver loop whose per-round lineage is truncated with
``localCheckpoint`` (an unbounded iterative plan otherwise grows until
the optimizer chokes), deterministic arithmetic, and a LOUD
non-convergence failure instead of silently returning a half-converged
result.

Pipeline relevance: rank-by-reference is the classic crawl
prioritization signal (domain/page authority feeding fetch order and
quality priors — the ``priority`` tier of the reference's
``crawl/select_batch.py`` generalized from a boolean to a score).

Per round: one shuffle of (dst, contribution) pairs + a dangling-mass
1-row aggregate — the textbook distributed PageRank shape. Vertices
with no outbound edges redistribute their mass uniformly (the standard
dangling fix), so total rank stays 1 every round (asserted by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 40,
    tol: float = 1e-6,
) -> DataFrame:
    """(vertex, rank) with Σrank = 1, converged to L1 delta < ``tol``.

    ``edges`` is a directed edge list; parallel edges count as repeated
    endorsements (dedupe upstream if unwanted). Raises ``RuntimeError``
    when ``max_iter`` rounds don't reach ``tol`` — callers must choose
    between more rounds or a looser tolerance, never silently ship a
    half-converged ranking.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        out = verts.select(F.col("v"), F.lit(0.0).alias("rank")).localCheckpoint()
        verts.unpersist()
        return out

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edge side enriched once; reused every round
    contrib_edges = e.join(outdeg, on="src").persist()
    contrib_edges.count()

    ranks = verts.select("v", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        with_rank = contrib_edges.join(
            ranks.select(F.col("v").alias("src"), "rank"), on="src"
        )
        inflow = (
            with_rank.select(
                F.col("dst").alias("v"), (F.col("rank") / F.col("deg")).alias("c")
            )
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling vertices (no outbound edges) spread their mass uniformly
        dangling = (
            ranks.join(outdeg.select(F.col("src").alias("v")), on="v", how="left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        new_ranks = (
            verts.join(inflow, on="v", how="left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.join(ranks.select("v", F.col("rank").alias("old")), on="v")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta < tol:
            verts.unpersist()
            contrib_edges.unpersist()
            return ranks.select("v", F.round("rank", 9).alias("rank"))
    verts.unpersist()
    contrib_edges.unpersist()
    raise RuntimeError(
        f"pagerank did not converge in {max_iter} rounds (last delta {delta:.2e})"
    )
