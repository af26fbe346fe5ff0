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

import numpy as np
import pandas as pd

# pd/np must be module-level: pandas_udf resolves the (stringified, PEP 563)
# type hints of UDFs defined in this module against these globals.
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-order dot product via ``zip_with`` + ``aggregate``.

    Left-associated IEEE adds in list order — the same order DuckDB's
    ``list_dot_product`` uses, so oracle hashes match bit-for-bit.

    ``dim`` is accepted for API compatibility but deliberately unused:
    unrolling to ``a[0]*b[0] + a[1]*b[1] + …`` was measured SLOWER than
    this higher-order-function form at every scale tried on Spark 4
    (2 M pairs × dim 64: 36 s unrolled vs 11 s HOF; 10 k pairs: 2.6 s vs
    0.7 s). The 64-term tree of ANSI bounds-checked ``getItem`` calls
    blows past janino's method-size budget, drops the projection out of
    whole-stage codegen, and is then a far bigger interpreted tree than
    the single array loop this form evaluates.
    """
    del dim  # see docstring — unrolled getItem chains lose on Spark 4
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
    """Sign-bit string ('1'/'0' per plane) — one LSH bucket key, as columns.

    Kept for API parity / single-table use. The bucketed operators below
    use ``_bucket_keys_udf`` instead: building num_tables × num_planes
    plane literals as Column trees costs seconds of driver-side analysis
    alone (measured 3.3 s plan build for 4×8 planes × dim 64), dwarfing
    the actual execution on any batch — one Arrow-batched matmul replaces
    the whole tree.
    """
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def _bucket_keys_udf(dim: int, num_planes: int, num_tables: int, seed_base: int):
    """Pandas UDF: embedding → array of ``num_tables`` integer bucket keys.

    All tables' sign bits come from ONE (batch × dim) @ (dim × T·B) numpy
    matmul per Arrow batch — JVM→Python transfer is the only overhead, and
    the planes ride along as a broadcast-sized closure constant. Keys are
    packed ints (bit b set iff dot(v, plane_b) ≥ 0), cheaper to shuffle
    and join on than bit-strings.
    """
    from pyspark.sql.types import ArrayType, LongType

    planes = np.array(
        [_hyperplanes(dim, num_planes, seed=seed_base + t) for t in range(num_tables)]
    ).reshape(num_tables * num_planes, dim)
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def keys(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        bits = (m @ planes.T >= 0).reshape(len(v), num_tables, num_planes)
        return pd.Series((bits * weights).sum(axis=2).tolist())

    return keys


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
    keys = _bucket_keys_udf(dim, num_planes, num_tables, seed_base=7)
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

    # centroids collected once to the driver (in production: trained
    # offline) and shipped as a closure constant into ONE vectorized
    # pandas UDF per side — assignment is a (batch × dim) @ (dim × lists)
    # matmul + argsort per Arrow batch, no join, no shuffle, no window.
    from pyspark.sql.types import ArrayType, IntegerType

    cent = np.array(
        [
            [float(x) for x in r["cv"]]
            for r in c.orderBy("neighbor_id").limit(num_lists).collect()
        ]
    )
    cent_n = np.sqrt((cent * cent).sum(axis=1))

    def nearest_udf(n: int):
        @F.pandas_udf(ArrayType(IntegerType()))
        def nearest(v: pd.Series) -> pd.Series:
            m = np.stack(v.to_numpy())
            cs = (m @ cent.T) / cent_n  # row norms cancel in per-row ranking
            # stable argsort on (-cos, list_id) — ties break to lower id
            order = np.argsort(-cs, axis=1, kind="stable")[:, :n]
            return pd.Series(order.tolist())

        return nearest

    assigned = c.withColumn("list_id", nearest_udf(1)(F.col("cv"))[0])
    probed = q.select(
        "query_id", "qv", "qn",
        F.explode(nearest_udf(num_probes)(F.col("qv"))).alias("list_id"),
    )
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


def exact_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact all-pairs cosine near-dups as a map-only blocked matmul.

    The right side (full id/vector matrix) is broadcast once; each corpus
    partition computes ``A_block @ B.T`` in one numpy call and emits pairs
    above the threshold with ``id_a < id_b``. No shuffle at all — the plan
    is scan → ArrowEvalPython → rows, and wall-clock scales linearly with
    partitions. Replaces the crossJoin + per-pair fold-``dot`` form
    (measured 13× faster at 2 k × 2 k with identical round-6 values —
    asserted against the fold form by tests).

    All-pairs exact is inherently O(N²): this is the *verifier/baseline*
    for ``embedding_near_dups`` (the LSH path). The broadcast side must fit
    executor memory — beyond that, chunk B and union the per-chunk runs,
    or switch to the LSH operator.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = corpus.schema[id_col].dataType
    pdf = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).toPandas()
    ids = pdf["id"].to_numpy()
    mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    sc = corpus.sparkSession.sparkContext
    b_ids, b_mat, b_nrm = sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(nrm)

    schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("cos", DoubleType()),
        ]
    )

    def blocks(batches):
        B, Bn, Bid = b_mat.value, b_nrm.value, b_ids.value
        for pb in batches:
            if not len(pb):
                continue
            A = np.stack(pb["v"].to_numpy()).astype(np.float64)
            An = np.sqrt((A * A).sum(axis=1))
            aid = pb["id"].to_numpy()
            cos = np.round((A @ B.T) / np.outer(An, Bn), 6)
            keep = (aid[:, None] < Bid[None, :]) & (cos >= threshold)
            i, j = np.nonzero(keep)
            yield pd.DataFrame({"id_a": aid[i], "id_b": Bid[j], "cos": cos[i, j]})

    return (
        corpus.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .mapInPandas(blocks, schema)
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
    keys = _bucket_keys_udf(dim, num_planes, num_tables, seed_base=101)
    b = c.select("id", "v", "nrm", F.posexplode(keys(F.col("v"))).alias("table", "bkey"))
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
