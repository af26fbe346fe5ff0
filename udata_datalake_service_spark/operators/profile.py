"""A9 — column profiling (csv_detective ``output_profile=True`` replacement).

Reference: analysis/csv.py:152-154 profiles every column of every converted
file (min/max/mean/std/tops/nb_distinct/nb_missing_values), asserted at
tests/test_analysis/test_analysis_csv.py:84-86.

Spark design: ONE aggregate pass computes every per-column statistic
simultaneously (a single scan + single reduce — not a loop of per-column
jobs). ``tops`` needs a per-column groupBy; those run as separate small
jobs only for requested columns. ``nb_distinct`` uses HLL
(approx_count_distinct) by default — at 100 TB an exact distinct per column
is a shuffle per column; HLL is one pass, merged map-side. Exact mode is
available for parity testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.DecimalType, T.ShortType)


def profile(df: DataFrame, exact_distinct: bool = False, top_n: int = 10) -> dict:
    """Return {column → {min,max,mean,std,nb_distinct,nb_missing_values,tops}}.

    Single wide aggregation row for the scalar stats; `tops` via per-column
    top-k (only place a second pass is semantically unavoidable).
    """
    aggs = []
    for f in df.schema.fields:
        c, name = F.col(f.name), f.name
        aggs.append(F.min(c).alias(f"{name}__min"))
        aggs.append(F.max(c).alias(f"{name}__max"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.mean(c).alias(f"{name}__mean"))
            aggs.append(F.stddev(c).alias(f"{name}__std"))
        if exact_distinct:
            aggs.append(F.count_distinct(c).alias(f"{name}__nd"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"{name}__nd"))
        aggs.append(F.count_if(c.isNull()).alias(f"{name}__nulls"))
    row = df.agg(*aggs).collect()[0].asDict()

    out: dict[str, dict] = {}
    for f in df.schema.fields:
        name = f.name
        stats = {
            "min": row.get(f"{name}__min"),
            "max": row.get(f"{name}__max"),
            "nb_distinct": row.get(f"{name}__nd"),
            "nb_missing_values": row.get(f"{name}__nulls"),
        }
        if isinstance(f.dataType, _NUMERIC):
            stats["mean"] = row.get(f"{name}__mean")
            stats["std"] = row.get(f"{name}__std")
        tops = (
            df.groupBy(F.col(name).alias("value"))
            .count()
            .orderBy(F.desc("count"), F.asc_nulls_last("value"))
            .limit(top_n)
            .collect()
        )
        stats["tops"] = [{"value": r["value"], "count": r["count"]} for r in tops]
        out[name] = stats
    return out


def quantile_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-column quantile profile: one row per column with the exact
    interpolated quantiles at ``probs`` (plus count and exact distinct).

    Exact mode uses ``percentile()`` — Spark's linear-interpolation
    definition is bit-identical to DuckDB/Postgres ``quantile_cont`` /
    ``percentile_cont`` (verified by the a9q oracle), so profiles are
    portable across engines. It buffers each column's values per
    partition and merges sorted runs — fine for profiling runs, wrong for
    a 100 TB hot path. ``approx=True`` swaps in ``approx_percentile``
    (Greenwald-Khanna sketch, accuracy 1/10000) and
    ``approx_count_distinct`` (HLL): single streaming pass, map-side
    merged, constant memory — the at-scale default; the pytest pins its
    error against the exact path.

    Physical shape: the quantiles+counts for ALL columns run in one
    aggregate, the distincts for all columns in a second, and the two
    1-row results cross-join before a narrow struct-explode transpose.
    Mixing exact COUNT(DISTINCT) (an Expand ×N rewrite) with percentile's
    object buffers in ONE aggregate forces a SortAggregate over the
    expanded input — measured 4× slower at sf0.1 than the two hash
    aggregates, and strictly worse at scale (the split pays one extra
    pruned-column scan; the mix pays a sort of N× the table).
    """
    cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
    ]
    plist = ", ".join(repr(p) for p in probs)
    q_aggs, nd_aggs = [], []
    for name in cols:
        c = F.col(name)
        if approx:
            q = F.expr(f"approx_percentile({name}, array({plist}), 10000)")
            nd = F.approx_count_distinct(c)
        else:
            q = F.expr(f"percentile({name}, array({plist}))")
            nd = F.count_distinct(c)
        q_aggs.extend([F.count(c).alias(f"{name}__n"), q.alias(f"{name}__q")])
        nd_aggs.append(nd.alias(f"{name}__nd"))
    one = df.agg(*q_aggs).crossJoin(df.agg(*nd_aggs))
    per_col = [
        F.struct(
            F.lit(name).alias("column"),
            F.col(f"{name}__n").alias("n"),
            F.col(f"{name}__nd").alias("nb_distinct"),
            *[
                F.round(F.col(f"{name}__q")[i].cast("double"), 6).alias(
                    "p" + f"{p * 100:g}".replace(".", "_")
                )
                for i, p in enumerate(probs)
            ],
        )
        for name in cols
    ]
    return one.select(F.explode(F.array(*per_col)).alias("r")).select("r.*")


def quantile_profile_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-GROUP quantile profile — the distribution-per-stratum view
    (quality bands per source, price bands per status) that a flat profile
    hides. One groupBy with map-side partial aggregation in approx mode;
    exact mode shuffles (group, value) pairs — same trade-off and column
    contract as ``quantile_profile``."""
    plist = ", ".join(repr(p) for p in probs)
    if approx:
        q = F.expr(f"approx_percentile({value_col}, array({plist}), 10000)")
        nd = F.approx_count_distinct(F.col(value_col))
    else:
        q = F.expr(f"percentile({value_col}, array({plist}))")
        nd = F.count_distinct(F.col(value_col))
    g = df.groupBy(group_col).agg(
        F.count(F.col(value_col)).alias("n"), nd.alias("nb_distinct"), q.alias("__q")
    )
    return g.select(
        group_col,
        "n",
        "nb_distinct",
        *[
            F.round(F.col("__q")[i].cast("double"), 6).alias(
                "p" + f"{p * 100:g}".replace(".", "_")
            )
            for i, p in enumerate(probs)
        ],
    )


def profile_df(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """DataFrame-valued profile (oracle-checkable shape): one row per column
    with count/nulls/distinct/min/max/mean/std over *numeric* columns.

    ONE aggregate pass for all columns (the N exact count_distincts become
    a single Expand ×N + one shuffle — vs the previous per-column
    agg-and-union which scanned the table N times), then a narrow
    explode-of-structs transpose of the single result row."""
    cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
    ]
    aggs = []
    for name in cols:
        c = F.col(name)
        aggs.extend(
            [
                F.count(c).alias(f"{name}__n"),
                F.count_if(c.isNull()).alias(f"{name}__nulls"),
                F.count_distinct(c).alias(f"{name}__nd"),
                F.round(F.min(c).cast("double"), 4).alias(f"{name}__min"),
                F.round(F.max(c).cast("double"), 4).alias(f"{name}__max"),
                F.round(F.mean(c), 4).alias(f"{name}__mean"),
                F.round(F.stddev(c), 4).alias(f"{name}__std"),
            ]
        )
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(name).alias("column"),
            F.col(f"{name}__n").alias("n"),
            F.col(f"{name}__nulls").alias("nulls"),
            F.col(f"{name}__nd").alias("nb_distinct"),
            F.col(f"{name}__min").alias("min_v"),
            F.col(f"{name}__max").alias("max_v"),
            F.col(f"{name}__mean").alias("mean_v"),
            F.col(f"{name}__std").alias("std_v"),
        )
        for name in cols
    ]
    return one.select(F.explode(F.array(*per_col)).alias("r")).select("r.*")
