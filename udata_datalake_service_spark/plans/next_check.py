"""ST3 — adaptive re-check scheduling ladder.

Reference: crawl/calculate_next_check.py:6-44 with
``CHECK_DELAYS = [12h, 24h, 168h, 720h]`` (config_default.toml:46):
- resource CHANGED (or no last-modification info) → earliest rung (12h);
- UNCHANGED → the first rung ≥ time since the detected last modification,
  capped at the top rung (720h).

Spark: one ``F.when`` ladder appended at check-insert time — a pure
projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHECK_DELAYS_HOURS = (12, 24, 168, 720)


def next_check_at(
    created_at: Column,
    has_changed: Column,
    detected_last_modified_at: Column,
    delays_hours: tuple[int, ...] = CHECK_DELAYS_HOURS,
) -> Column:
    """Column expression for checks.next_check_at."""
    age_hours = (
        created_at.cast("double") - detected_last_modified_at.cast("double")
    ) / 3600.0

    ladder: Column = F.lit(delays_hours[-1])
    for d in reversed(delays_hours[:-1]):
        ladder = F.when(age_hours <= F.lit(float(d)), F.lit(d)).otherwise(ladder)

    chosen = (
        F.when(has_changed | detected_last_modified_at.isNull(), F.lit(delays_hours[0]))
        .otherwise(ladder)
    )
    return created_at + chosen.cast("int") * F.expr("INTERVAL 1 HOUR")


def with_next_check(checks: DataFrame) -> DataFrame:
    """Apply the ladder to a checks frame that already carries
    ``change_status`` (see change_detection.with_change_detection)."""
    return checks.withColumn(
        "next_check_at",
        next_check_at(
            F.col("created_at"),
            F.col("change_status") == "HAS_CHANGED",
            F.col("detected_last_modified_at"),
        ),
    )
