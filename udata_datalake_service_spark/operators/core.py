"""Generic relational operator shapes, expressed as Catalyst-friendly plans.

Each function returns a lazily-planned DataFrame; nothing collects. Scale
notes are inline — every shape was chosen for the 100 TB case first and the
reference's semantics second.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_groups(
    df: DataFrame,
    group_expr: str | Column,
    k: int = 20,
    count_alias: str = "count",
    value_alias: str = "value",
) -> DataFrame:
    """A1 — `/api/checks/aggregate`: group by a *user-supplied expression*,
    count, top-k (db/check.py:87-98 — the reference interpolates the
    expression into SQL; here it's ``F.expr`` which is the same surface).

    Scale: groupBy → partial aggregation map-side, single shuffle on the
    group key, then a global top-k via ``orderBy().limit()`` which Catalyst
    executes as TakeOrderedAndProject — no full sort of the aggregate.
    Tie-break on the group value keeps the cut deterministic.
    """
    g = F.expr(group_expr) if isinstance(group_expr, str) else group_expr
    return (
        df.groupBy(g.alias(value_alias))
        .agg(F.count(F.lit(1)).alias(count_alias))
        .orderBy(F.desc(count_alias), F.asc_nulls_last(value_alias))
        .limit(k)
    )


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """O2/J5 idiom — newest row per key via row_number()==1.

    Replaces both the reference's ``ORDER BY created_at DESC LIMIT 1``
    point probes and its self-theta-join dedup
    (migrations/main/20230606_rev9_up_rev10.sql:4-6) with one shuffle on the
    key. ``order_cols`` must be a total order (pass a unique id as final
    tie-break) for deterministic output.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_n_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    n: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """O1 — top-n history probe per key (current vs previous check uses n=2,
    analysis/resource.py:234-247). Same single-shuffle window shape."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(
        F.col(rank_alias) <= n
    )


def pct_histogram(
    df: DataFrame,
    group_col: str | Column,
    value_alias: str = "value",
    count_alias: str = "count",
    pct_alias: str = "pct",
) -> DataFrame:
    """A4 — histogram with client-side percentage (routes/status.py:106-139).

    The over-all total is an unpartitioned window over the *aggregated*
    frame (|groups| rows), not the base table — the expensive count happens
    once in the groupBy; the window touches only group cardinality rows.
    """
    g = F.expr(group_col) if isinstance(group_col, str) else group_col
    agg = df.groupBy(g.alias(value_alias)).agg(F.count(F.lit(1)).alias(count_alias))
    total = Window.partitionBy()
    return agg.withColumn(
        pct_alias,
        F.round(F.col(count_alias) * 100.0 / F.sum(count_alias).over(total), 4),
    )


def count_over_all(df: DataFrame, count_alias: str = "count") -> DataFrame:
    """A7 — ``count(*) OVER ()`` alongside rows. Fine for small frames (the
    reference uses it on per-resource row sets); for big frames prefer a
    scalar agg + broadcast join, which this implements when beneficial."""
    return df.withColumn(count_alias, F.count(F.lit(1)).over(Window.partitionBy()))


def deterministic_sample(
    df: DataFrame, n: int, salt_cols: Sequence[str], seed: str = "s0"
) -> DataFrame:
    """O3/O4 — the reference samples via ``ORDER BY random() LIMIT n``
    (crawl/select_batch.py:47-89). Real randomness is oracle-hostile and
    cluster-hostile (full sort on rand). This uses md5(seed||key) ordering:
    uniformly pseudo-random, reproducible in ANSI SQL, and executed as
    TakeOrderedAndProject (heap of n per partition, no full sort).
    """
    key = F.md5(
        F.concat_ws("|", F.lit(seed), *[F.col(c).cast("string") for c in salt_cols])
    )
    return (
        df.withColumn("__rk", key)
        .orderBy("__rk")
        .limit(n)
        .drop("__rk")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: hot keys stop serializing on one reducer.

    Left rows get a deterministic salt in [0, num_salts) (hash of the whole
    row tuple — uniform, reproducible, no rand()); right rows are replicated
    once per salt via a small ``explode(sequence)``. Joining on
    (key, salt) splits each hot key's row group across ``num_salts``
    reducers. For the supported join types the results are row-identical to
    the plain join (asserted by tests); cost is num_salts× the (smaller)
    right side's shuffle volume — the standard trade when AQE's skew
    splitting can't kick in (e.g. the skewed side feeds a window, or stats
    hide the skew).

    Only ``inner``/``left``/``left_semi``/``left_anti`` are supported:
    right/full outer joins would emit every unmatched right row once per
    salt replica (num_salts copies), which is NOT equivalent to the plain
    join, so those types are rejected loudly rather than silently wrong.
    """
    _SALTED_HOW = {"inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "semi",
                   "left_anti", "leftanti", "anti"}
    if how.lower() not in _SALTED_HOW:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — right/full outer would "
            f"duplicate unmatched right rows once per salt; use one of "
            f"{sorted(_SALTED_HOW)}"
        )
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(num_salts))
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = l_s.join(r_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key_cols: Sequence[str], num_salts: int = 8
) -> DataFrame:
    """Two-phase skew-safe ``groupBy(key).count()``: pre-aggregate on
    (key, salt) so a hot key combines map-side across ``num_salts``
    partial groups, then sum partials per key. Identical counts to the
    direct groupBy (asserted by tests); the second shuffle carries one row
    per (key, salt) instead of every raw row of the hot key."""
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(num_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias("count"))


def union_tiers(*tiers: DataFrame) -> DataFrame:
    """U1 — concat of disjoint selection tiers (priority / never-checked /
    outdated). ``unionByName`` is a no-shuffle narrow op."""
    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)
    return out


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """U2 — ``INSERT ... ON CONFLICT (key) DO UPDATE`` (db/resource.py:43-53)
    as a dataframe-level merge: rows of ``updates`` win on key collision,
    unmatched target rows pass through, unmatched update rows are inserted.

    On a Delta/Iceberg lake this is ``MERGE INTO``; the plan here is the
    engine-agnostic equivalent: full-outer join on the key + coalesce.
    Scale: single shuffle on the key for both sides; if ``updates`` is a
    small batch Catalyst broadcast-joins it automatically.
    """
    cols = update_cols or [c for c in target.columns if c != key]
    u = updates.select(key, *[F.col(c).alias(f"__u_{c}") for c in cols])
    joined = target.join(u, on=key, how="full_outer")
    out_cols = [F.col(key)]
    for c in target.columns:
        if c == key:
            continue
        if c in cols:
            out_cols.append(F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def snapshot_diff_load(
    target: DataFrame,
    snapshot: DataFrame,
    key: str,
    deleted_col: str = "deleted",
) -> DataFrame:
    """U3 — full-snapshot diff load (cli.py:86-116): the reference marks all
    rows deleted then upserts every live row back. Single-pass equivalent:
    full-outer join; rows absent from the snapshot get deleted=true, rows
    present get the snapshot values and deleted=false (Delta's
    WHEN NOT MATCHED BY SOURCE pattern, SURVEY §2.7)."""
    snap_cols = [c for c in snapshot.columns if c != key]
    s = snapshot.select(
        F.col(key), F.lit(True).alias("__present"),
        *[F.col(c).alias(f"__s_{c}") for c in snap_cols],
    )
    joined = target.join(s, on=key, how="full_outer")
    out = [F.col(key)]
    for c in target.columns:
        if c == key:
            continue
        if c == deleted_col:
            # deleted = absent from the snapshot; survivors are un-deleted
            out.append(F.col("__present").isNull().alias(c))
        elif c in snap_cols:
            out.append(F.coalesce(F.col(f"__s_{c}"), F.col(c)).alias(c))
        else:
            out.append(F.col(c))
    return joined.select(*out)


def _es_wkey(weight: Column, salt_cols: Sequence[str], seed: str) -> Column:
    """The shared Efraimidis–Spirakis race key: a deterministic md5
    uniform u = (h32+1)/(2^32+1) ∈ (0,1), competing as round(ln(u)/w, 9).
    One definition so the global and grouped samplers (and their SQL
    oracles) can never diverge."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(seed), *[F.col(c).cast("string") for c in salt_cols]
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    return F.round(F.log(u) / weight, 9)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight: Column,
    salt_cols: Sequence[str],
    seed: str = "s0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis A-ES
    keys: each row draws a deterministic uniform u from md5(seed||key)
    and competes with key ``ln(u) / w`` — the top-n rows are a correct
    weight-proportional sample (the race each DSIR-style importance
    resampler runs over its weights).

    Same determinism/scale contract as `deterministic_sample`: the
    uniform is md5-derived (reproducible in ANSI SQL, no rand()), and the
    top-n runs as TakeOrderedAndProject — per-partition heaps of n, no
    global sort, nothing driver-side but the n winners. Non-positive
    weights are excluded (they can never win a weighted race).

    Appends the competition key as ``__wkey`` (callers drop it; the query
    surface keeps it for exact oracle attestation).
    """
    return (
        df.filter(weight > 0)
        .withColumn("__wkey", _es_wkey(weight, salt_cols, seed))
        .orderBy(F.desc("__wkey"), *[F.asc(c) for c in salt_cols])
        .limit(n)
    )


def weighted_sample_grouped(
    df: DataFrame,
    n_per_group: int,
    weight: Column,
    group_cols: Sequence[str],
    salt_cols: Sequence[str],
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum Efraimidis–Spirakis sampling: the top ``n_per_group``
    weighted-race winners WITHIN each group — stratified importance
    sampling (per-language / per-domain quotas over DSIR-style weights).

    Same deterministic race as `weighted_sample`; the global TakeOrdered
    becomes one row_number window partitioned by the group key — a single
    shuffle on the stratum, no global sort, winners only.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__wkey"), *[F.asc(c) for c in salt_cols]
    )
    return (
        df.filter(weight > 0)
        .withColumn("__wkey", _es_wkey(weight, salt_cols, seed))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )
