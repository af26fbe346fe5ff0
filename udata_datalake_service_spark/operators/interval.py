"""Interval (range) join — match point events to time ranges, or ranges to
overlapping ranges. The naive plan for ``l.ts BETWEEN r.start AND r.end``
is a broadcast-nested-loop (O(|L|·|R|) comparisons) — fine for a handful of
ranges, fatal at scale. The scalable shape here is the standard
bucketized-equi-join rewrite (Databricks' range-join optimization /
Flink's interval join, re-expressed in vanilla PySpark):

1. pick a bucket width W (≈ typical range length);
2. ranges explode to one row per W-aligned bucket they overlap — short
   ranges hit 1-2 buckets;
3. points map to their single bucket;
4. equi-join on (keys…, bucket) — hash join, shuffle on short keys;
5. re-check the exact predicate to drop bucket-edge false positives.

Cost: |R| · (avg_range/W + 1) replicated range rows, one hash shuffle, no
quadratic comparisons. The equality-key variant additionally partitions by
the join key, so only same-key candidates ever meet.

``interval_join_ranges`` (range-overlap) uses the same device on the
smaller side's buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udata_datalake_service_spark.caching import adopt

_B = "__iv_bucket"


def _us(col) -> F.Column:
    return F.unix_micros(col.cast("timestamp"))


def interval_join(
    points: DataFrame,
    ranges: DataFrame,
    point_ts: str,
    range_start: str,
    range_end: str,
    on: Sequence[str] = (),
    bucket_width_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every range row with
    ``start <= ts <= end`` (and equal ``on`` keys, if given).

    ``how``: 'inner' keeps matched pairs; 'left' also keeps unmatched
    points with NULL range columns. Range columns keep their names —
    disambiguate before calling if they clash with point columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how={how!r} not in inner/left")
    keys = list(on)
    w = int(bucket_width_us)

    # integer DIV for bucketing — floor(double/double) can round up across
    # a bucket boundary at microsecond magnitudes (~1e15)
    p = points.withColumn("__iv_us", _us(F.col(point_ts))).withColumn(
        _B, F.expr(f"__iv_us DIV {w}")
    )
    r = (
        ranges.withColumn("__iv_s", _us(F.col(range_start)))
        .withColumn("__iv_e", _us(F.col(range_end)))
        .withColumn(
            _B,
            F.explode(
                F.sequence(F.expr(f"__iv_s DIV {w}"), F.expr(f"__iv_e DIV {w}"))
            ),
        )
    )
    joined = p.join(r, on=[*keys, _B], how="inner").filter(
        (F.col("__iv_us") >= F.col("__iv_s")) & (F.col("__iv_us") <= F.col("__iv_e"))
    )
    out = joined.drop(_B, "__iv_us", "__iv_s", "__iv_e")
    if how == "inner":
        return out
    # left: points with zero matching ranges re-enter with NULL range
    # columns. left_anti on the full point row keeps every copy of an
    # unmatched row and none of a matched one (every copy of a matched
    # point is already in `out` via the inner join). The anti condition is
    # NULL-SAFE per column — plain equality would re-emit a matched point
    # that carries a NULL in any column — and `out` is persisted so the
    # bucketize-join pipeline isn't executed twice (union + anti build).
    out = out.persist()
    matched_pts = out.select(*points.columns).dropDuplicates().alias("m")
    pts = points.alias("p")
    anti_cond = None
    for c in points.columns:
        term = F.col(f"p.{c}").eqNullSafe(F.col(f"m.{c}"))
        anti_cond = term if anti_cond is None else (anti_cond & term)
    unmatched = pts.join(matched_pts, anti_cond, how="left_anti")
    range_cols = [c for c in ranges.columns if c not in keys]
    for c in range_cols:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(ranges.schema[c].dataType))
    return adopt(out.unionByName(unmatched.select(out.columns)), out)


def interval_join_ranges(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bucket_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Overlap join: pairs where ``[l_start, l_end]`` ∩ ``[r_start,
    r_end]`` ≠ ∅ (closed intervals, equal ``on`` keys). Both sides explode
    to their bucket spans; bucket-equi-join + exact overlap re-check, with
    a dedup on the pair (a pair may share several buckets). The dedup key
    is all output columns — pass frames with unique ids for exactness."""
    keys = list(on)
    w = int(bucket_width_us)

    def span(df: DataFrame, s: str, e: str, tag: str) -> DataFrame:
        return (
            df.withColumn(f"__iv_s{tag}", _us(F.col(s)))
            .withColumn(f"__iv_e{tag}", _us(F.col(e)))
            .withColumn(
                _B,
                F.explode(
                    F.sequence(
                        F.expr(f"__iv_s{tag} DIV {w}"),
                        F.expr(f"__iv_e{tag} DIV {w}"),
                    )
                ),
            )
        )

    l = span(left, left_start, left_end, "l")
    r = span(right, right_start, right_end, "r")
    joined = (
        l.join(r, on=[*keys, _B], how="inner")
        .filter(
            (F.col("__iv_sl") <= F.col("__iv_er"))
            & (F.col("__iv_sr") <= F.col("__iv_el"))
        )
        .drop(_B, "__iv_sl", "__iv_el", "__iv_sr", "__iv_er")
    )
    return joined.dropDuplicates(joined.columns)
