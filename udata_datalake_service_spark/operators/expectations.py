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
codegen: each rule is a column predicate); the report is a single
explode+groupBy over rule NAMES (bounded by #rules × partitions after
map-side combine). Splitting re-uses the same annotated frame — callers
that consume both halves should persist it (adopt/settle).
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
    n_rows = annotated.count()
    per_rule = (
        annotated.select(F.explode(VIOLATIONS_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    any_row = annotated.filter(F.size(VIOLATIONS_COL) > 0).agg(
        F.lit("_any_").alias("rule"), F.count(F.lit(1)).alias("n_violations")
    )
    spine = df.sparkSession.createDataFrame(
        [(r,) for r in sorted(rules)] + [("_any_",)], "rule string"
    )
    return (
        spine.join(per_rule.unionByName(any_row), on="rule", how="left")
        .select(
            "rule",
            F.coalesce("n_violations", F.lit(0)).cast("long").alias("n_violations"),
            F.round(
                F.coalesce("n_violations", F.lit(0))
                / F.lit(float(n_rows if n_rows else 1)),
                6,
            ).alias("violation_rate"),
        )
    )
