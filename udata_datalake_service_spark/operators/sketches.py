"""Mergeable-sketch profiling — the incremental statistics plane.

``profile``/``quantile_profile`` answer "profile this table NOW" with a
full pass. At 100 TB the nightly question is incremental: "update corpus
NDV and heavy hitters with today's partition, without rescanning history."
Apache DataSketches (built into Spark 4 as ``hll_sketch_agg`` /
``hll_union_agg`` / ``approx_top_k``) makes that a two-table algebra:

- ``ndv_sketch_table``: one row per group with a BINARY HLL sketch per
  column — the materialized sketch table you append per day/source (a few
  KB per group, vs the raw partition).
- ``merge_ndv``: union-merge sketches to estimates at ANY regrouping
  (daily → monthly → corpus) without touching raw data. HLL union is
  lossless over unions of sets, so merged estimates equal what a full
  rescan's sketch would say (pinned by test).
- ``heavy_hitters``: frequent items per column with error bounds.

Estimates are approximate (the exact paths stay in profile.py); no DuckDB
oracle exists because the sketch binary is engine-specific — accuracy and
merge-consistency are pytest-pinned instead (COVERAGE lists this check
type explicitly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ndv_sketch_table(
    df: DataFrame,
    group_cols: Sequence[str],
    value_cols: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketches: (group_cols…, <col>__hll binary …).

    One aggregate pass, map-side combined; the shuffle carries sketches
    (≤ 2^lg_k bytes each), never values. Append the output to a sketch
    table keyed by the group (day, source, …).
    """
    aggs = [
        F.expr(f"hll_sketch_agg(`{c}`, {int(lg_k)})").alias(f"{c}__hll")
        for c in value_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def merge_ndv(
    sketches: DataFrame,
    value_cols: Sequence[str],
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Union-merge a sketch table to NDV estimates, optionally regrouped by
    ``by`` (subset of the sketch table's group columns); ``by=None`` gives
    the single global row."""
    aggs = [
        F.expr(f"hll_sketch_estimate(hll_union_agg(`{c}__hll`))").alias(f"{c}_ndv")
        for c in value_cols
    ]
    if by:
        return sketches.groupBy(*by).agg(*aggs)
    return sketches.agg(*aggs)


def heavy_hitters(df: DataFrame, col: str, k: int = 10, capacity: int = 1000) -> DataFrame:
    """Approximate top-k frequent values of ``col`` (DataSketches
    frequent-items): one pass, mergeable, bounded memory — the 100 TB
    replacement for groupBy().count().orderBy().limit() when the column
    has unbounded cardinality. Returns (item, count) rows, most frequent
    first."""
    top = df.agg(F.expr(f"approx_top_k(`{col}`, {int(k)}, {int(capacity)})").alias("t"))
    return top.select(F.posexplode("t").alias("rank0", "e")).select(
        (F.col("rank0") + 1).alias("rank"),
        F.col("e.item").alias("item"),
        F.col("e.count").alias("count"),
    )
