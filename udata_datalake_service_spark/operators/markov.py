"""First-order Markov transition analytics over per-key event sequences.

Not in the reference (udata-hydra's checks time-series has no sequence
mining); first-class here because product/behavioral analytics engines
(ClickHouse, Amplitude-style funnels) all ship a transition-matrix
primitive, and it is the empirical prior a next-event model trains on.

Shape at 100 TB: one shuffle on the sequence key for the lag window
(shared with sessionization if composed), then a (prev, next) aggregate —
a tiny result whose groupBy partial-aggregates map-side. The probability
normalization runs as a window over the aggregated matrix (|states|²
rows at most), not over events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-corpus first-order transition matrix: for every observed
    (prev_event, next_event) adjacency within a key's time-ordered
    sequence, the count, the row-normalized probability, and the rank of
    the successor among the state's successors.

    Ordering is (ts, tiebreak) so equal timestamps resolve
    deterministically. Sequence boundaries: the first event of a key has
    no predecessor and contributes nothing. Probabilities round to 6;
    rank orders by count desc then successor name asc (deterministic
    across engines).

    Returns (prev_event, next_event, n, p, rnk).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(order_tiebreak))
    pairs = (
        df.withColumn("__prev", F.lag(F.col(event)).over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.col("__prev").alias("prev_event"), F.col(event).alias("next_event"))
    )
    mat = pairs.groupBy("prev_event", "next_event").agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("prev_event")
    wrank = Window.partitionBy("prev_event").orderBy(
        F.desc("n"), F.asc("next_event")
    )
    return mat.select(
        "prev_event",
        "next_event",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
        F.row_number().over(wrank).cast("long").alias("rnk"),
    )
