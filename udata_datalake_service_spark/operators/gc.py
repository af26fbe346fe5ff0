"""Maintenance plane: orphan GC (J4/ST8) and retention (P10/ST7).

Reference: cli.py:287-334 (purge-csv-tables) and cli.py:272-283
(purge-checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_converted_tables(checks: DataFrame, catalog: DataFrame) -> DataFrame:
    """J4 — converted tables whose URL left the catalog (cli.py:297-308).

    Reference SQL: checks LEFT JOIN (SELECT url, MAX(id), BOOL_AND(deleted)
    FROM catalog GROUP BY url) ON checks.parsing_table = md5(c.url)
    WHERE parsing_table IS NOT NULL AND (c.id IS NULL OR c.deleted).

    Plan: aggregate the (small) catalog, derive the md5 join key on the
    aggregated side, broadcast it into the big checks scan. The
    ``parsing_table IS NOT NULL`` filter is pushed into the parquet scan.
    Output: distinct orphaned parsing_table names.
    """
    cat_agg = (
        catalog.groupBy("url")
        .agg(F.max("id").alias("cat_id"), F.bool_and("deleted").alias("all_deleted"))
        .withColumn("k", F.md5("url"))
    )
    return (
        checks.filter(F.col("parsing_table").isNotNull())
        .join(F.broadcast(cat_agg), checks.parsing_table == cat_agg.k, "left")
        .filter(F.col("cat_id").isNull() | F.col("all_deleted"))
        .select("parsing_table")
        .distinct()
    )


def retention_filter(checks: DataFrame, retention_days: int = 60) -> DataFrame:
    """P10 — rows that SURVIVE the 60-day purge (cli.py:272-283).

    On a Delta lake this is ``DELETE FROM checks WHERE created_at < ...`` and,
    with date partitioning, pure partition drops. The returned frame is the
    post-purge table for rewrite-style lakes.
    """
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {retention_days} DAYS")
    return checks.filter(F.col("created_at") >= cutoff)


def purged_count(checks: DataFrame, retention_days: int = 60) -> DataFrame:
    """A8 — the DELETE..RETURNING count the CLI prints."""
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {retention_days} DAYS")
    return checks.filter(F.col("created_at") < cutoff).agg(
        F.count(F.lit(1)).alias("purged")
    )
