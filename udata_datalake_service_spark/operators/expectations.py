"""Row-level data-quality expectations: validate → quarantine → report.

The lakehouse constraint layer (Delta CHECK constraints / dbt tests /
Great Expectations, re-expressed as one declarative pass): a rule set is
a name → boolean-Column mapping; every row is annotated with the names
of the rules it violates, the frame splits into valid and quarantined
halves, and a per-rule report counts violations — the ingest gate that
keeps a 100 TB table from silently absorbing garbage.

The reference validates per-file at inspection time
(``analysis/csv.py`` type votes); this adds the per-ROW enforcement that
its Postgres schema got implicitly from column types and the service
never re-checked.

Shape: one map-only pass builds the violation array (whole-stage
codegen: each rule is a column predicate); the report is ONE aggregate
row (row count + one counter per rule name, partially combined map-side)
unpivoted to the per-rule grain — a single corpus pass, no eager jobs.
Splitting re-uses the same annotated frame — callers that consume both
halves should persist it (adopt/settle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "__violations"


def annotate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append ``__violations``: the sorted array of rule names each row
    fails (empty = clean). A NULL rule result counts as a violation —
    constraints must hold affirmatively, as in SQL CHECK semantics
    inverted for safety (Delta treats NULL CHECK results as pass; an
    ingest gate must not)."""
    if not rules:
        raise ValueError("rules must not be empty")
    parts = [
        F.when(~cond.eqNullSafe(F.lit(True)), F.lit(name))
        for name, cond in sorted(rules.items())
    ]
    arr = F.array_sort(
        F.filter(F.array(*parts), lambda x: x.isNotNull())
    )
    return df.withColumn(VIOLATIONS_COL, arr)


def split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): quarantined rows keep their violation list
    for triage; valid rows drop the bookkeeping column."""
    annotated = annotate(df, rules)
    valid = annotated.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = annotated.filter(F.size(VIOLATIONS_COL) > 0)
    return valid, bad


def report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule scorecard: (rule, n_violations, violation_rate) over the
    full frame, plus the ``_any_`` roll-up row (rows failing ≥1 rule) —
    one pass, rule-name-bounded shuffle."""
    annotated = annotate(df, rules)
    # r13 opt (guide §2.3, one pass): the previous shape paid THREE scans
    # of `df` — an eager count() job at build time, the explode+groupBy,
    # and the `_any_` filter+agg. One aggregate row now carries the total
    # row count, every per-rule violation count and the `_any_` roll-up
    # (rule-name-bounded width), and a stack() unpivots it — zero eager
    # jobs, one corpus pass, all map-side combined.
    names = sorted(rules)
    agg_cols = [F.count(F.lit(1)).alias("__n_rows")]
    for i, name in enumerate(names):
        agg_cols.append(
            F.sum(
                F.array_contains(F.col(VIOLATIONS_COL), name).cast("long")
            ).alias(f"__v{i}")
        )
    agg_cols.append(
        F.sum((F.size(VIOLATIONS_COL) > 0).cast("long")).alias("__v_any")
    )
    one = annotated.agg(*agg_cols)
    # Column-API unpivot (explode over a literal struct array) rather
    # than a stack() SQL string, so rule names with quotes/backslashes
    # can never break or inject into the expression.
    entries = [
        F.struct(F.lit(n).alias("rule"), F.col(f"__v{i}").alias("__v"))
        for i, n in enumerate(names)
    ] + [F.struct(F.lit("_any_").alias("rule"), F.col("__v_any").alias("__v"))]
    return one.select(
        F.explode(F.array(*entries)).alias("__kv"), "__n_rows"
    ).select(
        F.col("__kv.rule").alias("rule"),
        F.col("__kv.__v").alias("__v"),
        "__n_rows",
    ).select(
        "rule",
        F.coalesce("__v", F.lit(0)).cast("long").alias("n_violations"),
        F.round(
            F.coalesce("__v", F.lit(0))
            / F.when(F.col("__n_rows") > 0, F.col("__n_rows").cast("double")).otherwise(
                F.lit(1.0)
            ),
            6,
        ).alias("violation_rate"),
    )
