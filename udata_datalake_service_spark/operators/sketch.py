"""Count-min sketch: mergeable approximate counting for heavy hitters.

At 100 TB the exact token/URL/key frequency table is itself a large
shuffle; a count-min sketch (Cormode & Muthukrishnan 2005) is the
standard streaming/mergeable substitute: d independent hash rows x w
buckets of COUNTERS, each update adds to one bucket per row, and an
item's estimate is the MIN over its d buckets — always >= the true
count, with the overcount bounded by (n / w) per row whp.

Spark-first shape: building the sketch IS one groupBy((row, bucket))
count — the sketch is a (d*w)-row DataFrame, partial-aggregated
map-side, broadcastable, and MERGEABLE by construction (union + re-sum
— the property that lets per-day sketches roll up without touching raw
data). Point queries join the broadcast sketch d times cheaper: probe
items are exploded to their (row, bucket) pairs and joined once, then
min() per item.

Hashes are the repo's engine-portable md5 family (functions/hashing.py),
so the WHOLE sketch — buckets, collisions, estimates — is bit-identical
in the DuckDB oracle: the attested query checks estimate >= exact and
the exact overcount values, not just shapes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, row: int, width: int):
    """Engine-portable bucket id: first 15 md5 hex chars of "row:item"
    as a 60-bit int, mod width. DuckDB replay:
    ('0x' || substr(md5(row || ':' || x), 1, 15))::UBIGINT % width."""
    return _bucket_expr(col, F.lit(str(row)), width)


def _bucket_expr(col, row_col, width: int):
    """`_bucket` with the row index as a COLUMN (string-typed or castable):
    lets a build explode the d rows from one scan instead of unioning d
    re-scans of the input. cast(int row) renders "0".."d-1" — the same
    bytes F.lit(str(row)) fed md5, so buckets are bit-identical."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", row_col.cast("string"), col)), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def _rows_exploded(depth: int):
    """explode([0..depth-1]) — the single-scan replacement for the
    union-of-depth-branches build shape (guide §2.3: the union form
    re-scanned — and for token streams re-tokenized — the input once
    per hash row; the explode emits the same (row, item) pairs from ONE
    pass, map-side combined by the downstream aggregate)."""
    return F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")


def countmin_build(
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    weight: str | None = None,
) -> DataFrame:
    """Build the sketch over ``items[col]`` (optionally weighted).
    Returns (row, bucket, c) — d*w rows max; missing buckets are
    implicitly zero. One shuffle at the (row, bucket) grain, counts
    combined map-side."""
    w_expr = F.col(weight) if weight else F.lit(1).cast("long")
    # ONE scan of `items` exploding the d hash rows (r13 opt, guide §2.3:
    # the previous union-of-d-branches form re-scanned the input — and
    # re-tokenized upstream token streams — once per row); buckets and
    # sums are bit-identical to the union form.
    ex = items.select(
        _rows_exploded(depth), F.col(col).alias("__i"), w_expr.alias("w")
    )
    return (
        ex.select("row", _bucket_expr(F.col("__i"), F.col("row"), width).alias("bucket"), "w")
        .groupBy("row", "bucket")
        .agg(F.sum("w").alias("c"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): union + re-sum.
    The roll-up that makes per-shard/per-day sketches composable."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def bloom_build(
    items: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Bloom filter over ``items[col]`` as a SPARSE set-bit table
    (row, bucket) — at most d*w rows, usually far fewer. Shares the
    engine-portable md5 bucket family with the count-min sketch, so the
    whole filter — including its false positives — is bit-identical in a
    DuckDB oracle replay.

    The 100 TB use: a membership prefilter that travels as a broadcast
    instead of a shuffle. Where ``operators/reduction.py`` ships the
    EXACT distinct key set to prefilter a join, a bloom caps the
    broadcast at d*w rows regardless of member-set cardinality, trading
    a bounded, measurable false-positive rate (survivors still join
    exactly downstream, so false positives cost work, never
    correctness). Mergeable by construction: union + distinct, so
    per-day / per-shard filters roll up without touching raw data."""
    # single-scan explode form — see countmin_build (r13 opt, guide §2.3)
    ex = items.select(_rows_exploded(depth), F.col(col).alias("__i"))
    return ex.select(
        "row", _bucket_expr(F.col("__i"), F.col("row"), width).alias("bucket")
    ).distinct()


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge filters built with the same (depth, width): union +
    distinct. Set-bit union is exactly the filter of the unioned member
    sets — the mergeability law pinned by test."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Membership test for ``probes[col]``: explode each probe to its d
    (row, bucket) coordinates, left-join the BROADCAST set-bit table,
    and a probe passes iff every coordinate hit a set bit. Returns
    (col, bloom_hit) — no member is ever rejected (one-sided error);
    non-members pass with probability ~(fill)^d, visible in the data."""
    coords_src = probes.select(col).distinct()
    # single-scan explode form — see countmin_build (r13 opt, guide §2.3)
    all_rows = coords_src.select(col, _rows_exploded(depth)).select(
        col, "row", _bucket_expr(F.col(col), F.col("row"), width).alias("bucket")
    )
    return (
        all_rows.join(
            F.broadcast(bloom.withColumn("_set", F.lit(1))),
            on=["row", "bucket"],
            how="left",
        )
        .groupBy(col)
        .agg(F.min(F.col("_set").isNotNull()).alias("bloom_hit"))
    )


def _kmv_hash(col):
    """Engine-portable 60-bit uniform hash: first 15 md5 hex chars as a
    long. DuckDB replay: ('0x' || substr(md5(x), 1, 15))::UBIGINT."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _kmv_rank(hashes: DataFrame, group_cols: Sequence[str], k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_build(
    items: DataFrame,
    col: str,
    group_cols: Sequence[str],
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group: the k
    smallest 60-bit hash values of the distinct items (Bar-Yossef et al.
    2002). Returns (group_cols…, rn, h) — exactly k rows per group (fewer
    iff the group's NDV < k, in which case the sketch IS the exact
    distinct set).

    Where the HLL plane (operators/sketches.py) uses Spark's DataSketches
    binaries — mergeable but engine-opaque — KMV over the repo's md5
    family is a distinct-count sketch whose EVERY value is replayable in
    ANSI SQL, so the oracle attests the sketch itself, not just its
    shape. Cost: one distinct (map-side partial) + one per-group rank;
    the sketch is k rows per group however large the group gets — the
    mergeable per-day NDV table at 100 TB (a few KB) vs re-scanning
    history for exact distinct counts."""
    hashes = items.select(*group_cols, _kmv_hash(col).alias("h"))
    return _kmv_rank(hashes, group_cols, k)


def kmv_merge(
    *sketches: DataFrame, group_cols: Sequence[str], k: int = 64
) -> DataFrame:
    """Merge sketches built with the same k: union the surviving hashes,
    re-rank, keep the k smallest. min-k(min-k(A) ∪ min-k(B)) =
    min-k(A ∪ B), so merged estimates equal a whole-data build — the law
    pinned by test."""
    out = sketches[0].select(*group_cols, "h")
    for s in sketches[1:]:
        out = out.unionByName(s.select(*group_cols, "h"))
    return _kmv_rank(out, group_cols, k)


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str], k: int = 64
) -> DataFrame:
    """NDV estimate per group: with R = h_k / 2^60 the normalized kth
    minimum, est = (k-1) / R; a group whose sketch holds fewer than k
    hashes is exact by construction (est = sketch size). Returns
    (group_cols…, sketch_n, kth_h, ndv_est)."""
    num = F.lit(float(k - 1) * 2.0**60)
    return (
        sketch.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("sketch_n"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth_h"),
        )
        .withColumn(
            "ndv_est",
            F.when(
                F.col("sketch_n") < k, F.col("sketch_n").cast("double")
            ).otherwise(num / F.col("kth_h").cast("double")),
        )
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query estimates for ``probes[col]``: explode each probe to
    its d (row, bucket) coordinates, join the BROADCAST sketch, min per
    probe. Probes absent from every bucket estimate 0 (cannot happen for
    items that were actually inserted). Returns (col, est)."""
    coords = probes.select(col).distinct()
    # single-scan explode form — see countmin_build (r13 opt: the union
    # form re-ran the probe subtree — often an agg+limit pipeline —
    # once per hash row)
    all_rows = coords.select(col, _rows_exploded(depth)).select(
        col, "row", _bucket_expr(F.col(col), F.col("row"), width).alias("bucket")
    )
    return (
        all_rows.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
