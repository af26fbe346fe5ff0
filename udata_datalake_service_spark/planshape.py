"""Plan-shaping devices that keep Catalyst from undoing a staged layout.

The text/curation plane stages its expensive expressions (the document
tokenize, derived scores) into explicit projections so each evaluates
once. Two optimizer rules can silently undo that:

* ``PushPredicateThroughNonJoin`` substitutes projected aliases into a
  filter predicate *unconditionally* — a gate like
  ``filter(quality >= 0.55)`` over a staged projection gets rewritten
  into the full score expression tree, pushed below the staging project
  (and below the repartition Exchange that was buying parallelism), and
  the stage then evaluates the expensive subtree twice: once inside the
  pushed predicate, once in the projection above it. Measured on the
  sf0.1 curation gate: the pushed predicate re-inlined the document
  tokenize ~40× (one copy per score reference) onto the 1-partition
  parquet scan.
* ``CollapseProject`` merges adjacent projections, but since Spark 3.3
  it already refuses to inline non-cheap expressions referenced more
  than once — staged token columns survive it on their own.

``pinned_filter`` blocks the first rule: the predicate additionally
references a non-deterministic pin column, and Catalyst never reorders
non-deterministic expressions, so the filter stays exactly where the
caller put it. Results are untouched (see the function docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PIN = "__pin"


def pinned_filter(df: DataFrame, cond: Column) -> DataFrame:
    """``df.filter(cond)`` that cannot be pushed below ``df``'s current
    projection.

    Mechanism: project a ``monotonically_increasing_id()`` pin column and
    filter on ``cond OR pin < 0``. The pin is non-negative by definition,
    so the predicate is semantically ``cond`` (a NULL ``cond`` stays
    NULL — ``NULL OR false = NULL`` — and the row drops exactly as in a
    plain filter). Because the pinned projection contains a
    non-deterministic field, ``PushPredicateThroughNonJoin`` refuses to
    push the filter through it, so the staged columns the predicate
    references evaluate exactly once, above any repartition. The pin
    column is dropped immediately; schema and row set are identical to
    ``df.filter(cond)``.

    RULE (VERDICT r13 item 8): never pin a predicate on a RAW scannable
    column. The pin blocks pushdown of EVERYTHING bundled into ``cond``,
    so a cheap predicate on a column that exists in the parquet scan
    (ids, dates, sources) would lose its PushedFilters row for nothing —
    apply such predicates with a plain ``.filter`` BEFORE the staging
    projection and pin only staged-column-derived conditions.
    ``tests/test_text_staged.py::test_pinned_conditions_reference_only_staged_columns``
    enforces this for every call site.
    """
    pinned = df.withColumn(_PIN, F.monotonically_increasing_id())
    return pinned.filter(cond | (F.col(_PIN) < F.lit(0))).drop(_PIN)
