"""Gap-based sessionization — the standard event-analytics operator (not in
the reference, whose checks time-series has no session concept; first-class
here because any engine claiming event analytics needs it).

Two formulations of identical semantics:

- ``sessionize`` / ``session_stats``: the lag-window form — a new session
  starts when the gap to the previous event of the same key exceeds
  ``gap_seconds``; session index = running count of session starts. One
  shuffle on the key; the two stacked windows share one partitioning/sort,
  so Catalyst plans a single Window node pair over one Exchange. Exactly
  replayable in ANSI SQL (the DuckDB oracle).

- ``session_stats_native``: Spark's built-in ``F.session_window`` — the
  streaming-capable formulation (state-store backed with watermarks in a
  stream). Batch semantics match the lag form (asserted by tests), so the
  same pipeline can run batch or streaming without changing outputs.

At 100 TB: both forms shuffle each key's events once; per-key state is one
session's worth for streaming. Hot keys are bounded by per-user event
volume, not corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tie_break: Sequence[str] = (),
    session_col: str = "session_idx",
) -> DataFrame:
    """Tag every event with its 1-based session index within the key.

    ``tie_break`` orders events sharing a timestamp (pass a unique id for
    determinism). New session ⇔ first event of the key, or gap from the
    previous event >= ``gap_seconds`` (an event landing exactly on the
    boundary STARTS a new session, matching session_window's half-open
    [start, start+gap) windows). NULL timestamps order LAST (matching the
    SQL oracle's default ORDER BY): the first folds into the key's last
    session (NULL gap ⇒ not a start, the SQL CASE's ELSE), and any
    further NULL-ts rows each start a new one (their lag IS NULL) — the
    exact replay of the oracle's window expression.
    """
    order = [F.asc_nulls_last(ts_col), *[F.asc(c) for c in tie_break]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    # NB: a NULL gap (NULL-ts row after a real one) yields NULL → the
    # cast/sum treats it as not-a-start, replaying the SQL CASE's ELSE
    is_start = prev_ts.isNull() | (gap >= F.lit(int(gap_seconds) * 1_000_000))
    return df.withColumn(
        session_col,
        F.sum(is_start.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tie_break: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-session rollup: key, session_idx, start/end (unix micros),
    n_events, plus caller aggregates. Map-side partial aggregation applies
    to the second groupBy; the expensive ordering happened once in the
    sessionize window."""
    tagged = sessionize(df, keys, ts_col, gap_seconds, tie_break)
    return tagged.groupBy(*keys, "session_idx").agg(
        F.unix_micros(F.min(ts_col).cast("timestamp")).alias("start_us"),
        F.unix_micros(F.max(ts_col).cast("timestamp")).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        *aggs,
    )


def session_stats_native(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """The same rollup via ``F.session_window`` — Spark's native session
    operator (streaming-capable: swap readStream in, add a watermark, keep
    the plan). Emits the same (key, start_us, end_us, n_events) rows as
    ``session_stats`` minus the session ordinal (window start is the
    session identity here)."""
    sw = F.session_window(F.col(ts_col).cast("timestamp"), f"{int(gap_seconds)} seconds")
    out = df.groupBy(*keys, sw.alias("__sw")).agg(
        F.unix_micros(F.min(ts_col).cast("timestamp")).alias("start_us"),
        F.unix_micros(F.max(ts_col).cast("timestamp")).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        *aggs,
    )
    return out.drop("__sw")
