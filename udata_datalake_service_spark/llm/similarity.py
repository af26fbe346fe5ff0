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


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-order dot product.

    With ``dim`` known, unrolls to ``a[0]*b[0] + a[1]*b[1] + …`` — plain
    expressions inside whole-stage codegen, ~2 orders of magnitude faster
    than the interpreted higher-order-function path, and bit-identical to
    it (left-associated IEEE adds in list order, the same order DuckDB's
    ``list_dot_product`` uses). Without ``dim``, falls back to
    ``aggregate`` (works for any length, interpreted).
    """
    if dim is not None:
        terms = [a.getItem(i) * b.getItem(i) for i in range(dim)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query.

    ``queries`` is expected small (broadcast); the corpus is scanned once.
    Norms are computed once per row *before* the pair blow-up (1 dot per
    pair instead of 3). Result: (query_id, neighbor_id, cos) with rank ≤ k,
    self-matches excluded, ties broken by neighbor id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        ).withColumn("qn", norm(F.col("qv"), dim))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv"), dim))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn")), 6),
        )
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
    """Sign-bit string ('1'/'0' per plane) — the LSH bucket key.

    Deliberately uses the interpreted ``aggregate`` dot: unrolling
    num_planes × num_tables × dim terms into one projection overflows
    janino's method-size limit (ANSI array-bounds checks per getItem) and
    degrades to a far slower interpreted giant-tree fallback. Key
    computation is once per row — not the hot path; the per-pair scoring
    dot is the unrolled one.
    """
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
    ).withColumn("cn", norm(F.col("cv"), dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv"), dim))

    # all tables' bucket keys in ONE pass over each side (posexplode), not
    # num_tables re-reads of the corpus
    def keys(vec: Column) -> Column:
        return F.array(
            *[
                signature_bits(vec, _hyperplanes(dim, num_planes, seed=7 + t))
                for t in range(num_tables)
            ]
        )

    cb = c.select(
        "neighbor_id", F.posexplode(keys(F.col("cv"))).alias("table", "bkey")
    )
    qb = q.select(
        "query_id", F.posexplode(keys(F.col("qv"))).alias("table", "bkey")
    )
    cand = (
        qb.join(cb, on=["table", "bkey"])
        .select("query_id", "neighbor_id")
        .distinct()
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = (
        cand.join(q, on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_lists: int = 16,
    num_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF-style approximate top-k: data-dependent inverted lists.

    Poor-man's IVF without iterative k-means (which would be a driver loop):
    the first ``num_lists`` corpus vectors act as centroids (at production
    scale you'd train real centroids offline and broadcast them — the plan
    shape is identical). Every corpus vector joins its nearest list; each
    query probes its ``num_probes`` nearest lists; exact cosine re-rank on
    the probed lists only.

    Scale: centroid assignment is a broadcast join + argmax over
    ``num_lists`` unrolled dots (no shuffle); candidate generation is an
    equi-join on the short list id — same shuffle shape as the LSH path but
    with data-adaptive buckets (better recall on clustered corpora).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv"), dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv"), dim))

    # centroids as a tiny broadcast table (in production: trained offline);
    # assignment = broadcast join + per-vector window argmax — no giant
    # unrolled expression (janino cliff), one small shuffle on the vector id
    spark = corpus.sparkSession
    cents = [
        (i, [float(x) for x in r["cv"]], math.sqrt(sum(float(x) ** 2 for x in r["cv"])))
        for i, r in enumerate(c.orderBy("neighbor_id").limit(num_lists).collect())
    ]
    cent_df = F.broadcast(
        spark.createDataFrame(
            cents, "list_id int, centroid array<double>, cent_norm double"
        )
    )

    def nearest_lists(side: DataFrame, key: str, vec: str, nrm: str, n: int) -> DataFrame:
        scored = side.crossJoin(cent_df).withColumn(
            "__cs",
            dot(F.col(vec), F.col("centroid"), dim) / (F.col(nrm) * F.col("cent_norm")),
        )
        w = Window.partitionBy(key).orderBy(F.desc("__cs"), F.asc("list_id"))
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__cs", "__rn", "centroid", "cent_norm")
        )

    assigned = nearest_lists(c, "neighbor_id", "cv", "cn", 1)
    probed = nearest_lists(q, "query_id", "qv", "qn", num_probes)
    scored = (
        probed.join(assigned, on="list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn")), 6),
        )
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
    ).withColumn("nrm", norm(F.col("v"), dim))
    bkeys = F.array(
        *[
            signature_bits(F.col("v"), _hyperplanes(dim, num_planes, seed=101 + t))
            for t in range(num_tables)
        ]
    )
    b = c.select("id", "v", "nrm", F.posexplode(bkeys).alias("table", "bkey"))
    l = b.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"),
        "table", "bkey",
    )
    r = b.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"),
        "table", "bkey",
    )
    return (
        l.join(r, on=["table", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cos",
            F.round(dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
