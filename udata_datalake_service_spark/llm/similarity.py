"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus; per-query heap via window row_number. The
  baseline and the verifier for approximate paths.
- ``lsh_bucketed_topk`` — random-hyperplane LSH: sign-bit signatures from
  md5-seeded deterministic hyperplanes, equi-join on bucket key, exact
  re-rank inside buckets. The 100 TB path: candidate generation is a
  shuffle on a short bucket key instead of a corpus × queries cross join.
- ``embedding_near_dups`` — corpus self-join near-dup detection above a
  cosine threshold, LSH-bucketed.

Dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` with a
DOUBLE accumulator in list order — sequential IEEE adds, reproducible
exactly by the DuckDB oracle's ``list_dot_product`` on DOUBLE[].
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query.

    ``queries`` is expected small (broadcast); the corpus is scanned once.
    Result: (query_id, neighbor_id, cos) with rank ≤ k, self-matches
    excluded, ties broken by neighbor id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a hash-based generator
    (no RNG state, reproducible across runs/engines). Components are
    uniform in [-1, 1) derived from md5-free integer mixing."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            # splitmix64-style integer mix — stable, platform-independent
            z = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & (
                2**64 - 1
            )
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
            z = z ^ (z >> 31)
            row.append((z / 2**63) - 1.0)
        planes.append(row)
    return planes


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit string ('1'/'0' per plane) — the LSH bucket key."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share a bucket in ≥1 of ``num_tables``
    sign-LSH tables; exact cosine re-rank on candidates only.

    Recall grows with num_tables; cost per table is an equi-join on an
    ``num_planes``-bit key. At 1000 executors each table's join is a plain
    shuffled hash join on a short string key.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )

    cand = None
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed=7 + t)
        cb = c.select("neighbor_id", signature_bits(F.col("cv"), planes).alias("bkey"))
        qb = q.select("query_id", signature_bits(F.col("qv"), planes).alias("bkey"))
        pairs = qb.join(cb, on="bkey").select("query_id", "neighbor_id")
        cand = pairs if cand is None else cand.unionByName(pairs)

    cand = cand.distinct().filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        cand.join(q, on="query_id")
        .join(c, on="neighbor_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 12,
    num_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate vectors (cos ≥ threshold) via LSH self-join."""
    c = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    cand = None
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed=101 + t)
        b = c.select("id", "v", signature_bits(F.col("v"), planes).alias("bkey"))
        l = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bkey")
        r = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bkey")
        pairs = (
            l.join(r, on="bkey")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "va", "vb")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
