"""Window funnel — ordered step matching within a time horizon (the
ClickHouse ``windowFunnel`` / product-analytics staple): per key, the
deepest prefix of ``steps`` completed by events with strictly increasing
timestamps where the WHOLE chain fits inside ``horizon`` seconds of its
first step (the window anchors at the chain START, so an early anchor can
fail while a later one completes — naive earliest-event greedy is wrong).

Exact algorithm, declarative and scale-bounded:

- stage 1 frontier = every step-1 event (key, t1) — each is a candidate
  anchor;
- stage i+1 frontier = for each surviving anchor (key, t1), the MIN
  step-(i+1) timestamp t in (t_i, t1 + horizon]. Greedy-min pruning is
  lossless: any chain extending SOME (key, t1) chain also extends the
  min-t_i one (a smaller t_i only widens the (t_i, t1+horizon] window),
  so keeping one row per anchor per stage preserves the exists-semantics
  while bounding every frontier to |step-1 events| rows.
- level(key) = deepest stage any of its anchors reached; keys present in
  the input but without a step-1 event report level 0.

Physical shape per stage: one equi-join on the key (range predicate is a
post-join filter) + one groupBy(key, t1) min — shuffles on the key only.
At extreme scale with fat per-key event lists, pre-bucket by (key,
horizon-bucket) exactly like operators/interval.py to cut the join's
per-key fan-out; the frontier recurrence is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_levels(
    events: DataFrame,
    steps: Sequence[str],
    horizon_s: int,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key funnel depth: (key, level) for EVERY distinct key in
    ``events``; level ∈ [0, len(steps)]."""
    if not steps:
        raise ValueError("steps must be non-empty")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    horizon_us = int(horizon_s) * 1_000_000

    ev = events.select(F.col(key).alias("k"), us.alias("t"), F.col(type_col).alias("et"))
    frontier = (
        ev.filter(F.col("et") == steps[0])
        .select("k", F.col("t").alias("t1"), F.col("t").alias("ti"))
        .distinct()
    )
    levels = frontier.select("k").distinct().withColumn("level", F.lit(1))
    for step in steps[1:]:
        nxt = ev.filter(F.col("et") == step).select("k", F.col("t").alias("tn"))
        frontier = (
            frontier.join(nxt, on="k")
            .filter(
                (F.col("tn") > F.col("ti"))
                & (F.col("tn") <= F.col("t1") + F.lit(horizon_us))
            )
            .groupBy("k", "t1")
            .agg(F.min("tn").alias("ti"))
        )
        levels = levels.unionByName(
            frontier.select("k").distinct().withColumn("level", F.lit(1))
        )
    reached = levels.groupBy("k").agg(F.sum("level").alias("level"))
    # sum of one row per reached stage == deepest stage (stages are nested)
    base = events.select(F.col(key).alias("k")).distinct().alias("base")
    r = reached.alias("r")
    # null-safe: a NULL key's computed depth must survive the join-back
    # (a plain equi-join would silently report level 0 for it)
    return (
        base.join(r, F.col("base.k").eqNullSafe(F.col("r.k")), "left")
        .select(
            F.col("base.k").alias(key),
            F.coalesce(F.col("r.level"), F.lit(0)).cast("long").alias("level"),
        )
    )


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix — the other product-analytics staple next
    to the funnel: cohort a key by its FIRST event's time bucket, then for
    each (cohort, offset) report how many of the cohort's keys were active
    ``offset`` buckets later.

    Buckets are fixed-width windows of ``bucket_days`` from the Unix epoch
    (deterministic integer division — no calendar-week locale semantics to
    desync engines). Returns (cohort_bucket, bucket_offset, n_active,
    n_cohort, retention) with retention rounded to 6; offset 0 rows carry
    n_active == n_cohort by construction.

    Scale shape: one groupBy(key) min for cohorts, one distinct over
    (key, bucket), one join back on the key, one final groupBy — every
    shuffle on the key or the (cohort, offset) pair; no window over the
    corpus.
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    bucket_us = int(bucket_days) * 86_400_000_000
    # exact FLOOR division on integers (the oracle's `//`): double
    # division would truncate toward zero for pre-epoch timestamps and
    # lose precision past 2^53 µs — align to the bucket multiple with a
    # positive mod, then the DIV is exact
    ev = events.select(F.col(key).alias("k"), us.alias("__us")).select(
        "k",
        F.expr(
            f"(__us - ((__us % {bucket_us} + {bucket_us}) % {bucket_us}))"
            f" DIV {bucket_us}"
        ).alias("b"),
    )
    cohorts = ev.groupBy("k").agg(F.min("b").alias("cohort_b"))
    active = ev.distinct()
    per = (
        active.alias("a")
        .join(
            cohorts.alias("c"),
            F.col("a.k").eqNullSafe(F.col("c.k")),  # NULL keys stay counted
        )
        .groupBy(
            F.col("cohort_b").alias("cohort_bucket"),
            (F.col("b") - F.col("cohort_b")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cohorts.groupBy(F.col("cohort_b").alias("cohort_bucket")).agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        per.join(sizes, on="cohort_bucket")
        .withColumn("retention", F.round(F.col("n_active") / F.col("n_cohort"), 6))
        .select("cohort_bucket", "bucket_offset", "n_active", "n_cohort", "retention")
    )
