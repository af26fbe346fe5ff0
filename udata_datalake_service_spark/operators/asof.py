"""Distributed as-of join — the point-in-time lookup the reference's
Postgres never needed (its "latest check" probes are key-equality, J1), but
any time-series analytics engine does: for each left row (key, t), attach
the most recent right row at or before t (backward), or the earliest at or
after t (forward), optionally within a tolerance.

Spark-first shape: NOT a range join (which Catalyst would execute as a
broadcast-nested-loop over the inequality) — instead the classic
union + partitioned-window formulation:

    union(left ∪ right) → window over (key) ordered by (ts, side)
    → last(right-payload struct, ignorenulls) over rows ≤ current

One shuffle on the key, sort within partitions, no row multiplication, and
whole-stage-codegen throughout. At 100 TB both sides shuffle once on the
join key — same cost envelope as a sort-merge equi-join; AQE handles
per-key skew the same way it does for any window (coalescing neighbors),
and a genuinely hot key can be range-bucketed by time first.

Semantics match DuckDB's ASOF JOIN (the oracle): backward = right.ts <=
left.ts, inclusive; ties between right rows at identical (key, ts) are
broken by ``tie_break`` columns (latest wins), which the caller should make
unique for determinism. Left rows with a NULL timestamp or a NULL in any
join key never match (SQL equi/inequality semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    ``value_cols`` (prefixed ``asof_``) and its timestamp as
    ``asof_<right_ts>``; all-NULL when no right row qualifies.

    ``direction``: 'backward' (right.ts <= left.ts, nearest below) or
    'forward' (right.ts >= left.ts, nearest above), both inclusive.
    ``tolerance_us``: max |left.ts - right.ts| in microseconds; farther
    matches are nulled out (pandas ``merge_asof(tolerance=...)``
    semantics). ``tie_break``: extra right-side order columns — among
    right rows sharing (key, ts) the greatest tie_break tuple wins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction={direction!r} not in backward/forward")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    # internal alias: a right value column literally named "ts" must not
    # collide with the matched-timestamp field
    payload = F.struct(
        F.col(right_ts).alias("__ats"), *[F.col(c).alias(c) for c in value_cols]
    )
    tb_names = [f"__asof_tb{i}" for i in range(len(tie_break))]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        *[F.col(c).alias(a) for c, a in zip(tie_break, tb_names)],
        F.lit(1).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        *[
            F.lit(None).cast(r.schema[a].dataType).alias(a)
            for a in tb_names
        ],
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Sort so every qualifying right row precedes the left row it can serve:
    # backward → ascending ts, right-before-left at equal ts (inclusive >=);
    # forward → descending ts, same side order (inclusive <=). NULL left
    # timestamps sort last and are nulled out explicitly below.
    ts_order = F.asc_nulls_last(_TS) if direction == "backward" else F.desc_nulls_last(_TS)
    order = [ts_order, F.desc(_SIDE), *[F.asc(a) for a in tb_names]]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col(_PAYLOAD), ignorenulls=True).over(w)

    out = (
        u.withColumn(_MATCH, matched)
        .filter(F.col(_SIDE) == 0)
        .drop(_SIDE, _PAYLOAD, *tb_names)
    )
    match = F.col(_MATCH)
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col(_TS).cast("timestamp"))
            - F.unix_micros(match["__ats"].cast("timestamp"))
        )
        match = F.when(gap <= F.lit(tolerance_us), match)
    # SQL equi/inequality semantics: a NULL timestamp OR a NULL in any
    # join key never matches (the window would otherwise group NULL keys
    # together, diverging from DuckDB ASOF JOIN — the stated oracle)
    not_null = F.col(_TS).isNotNull()
    for k in keys:
        not_null = not_null & F.col(k).isNotNull()
    match = F.when(not_null, match)
    out = out.withColumn(_MATCH, match).drop(_TS)
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col(_MATCH)["__ats"].alias(f"asof_{right_ts}"))
    sel.extend(F.col(_MATCH)[c].alias(f"asof_{c}") for c in value_cols)
    return out.select(*sel)
