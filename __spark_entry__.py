"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``udata_datalake_service_spark``; this module is
the thin binding required by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udata_datalake_service_spark.entry_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — every query has one
    (the approximate ANN paths are deterministic, so their oracles replay
    the same bucketing/probing math in SQL).

    curate_zipf's oracle reads a parquet fixture written by the PURE-
    PYTHON twin of the distributed generator; materialize it here so the
    oracle set is self-sufficient even when the SQL binds before the
    Spark query has run (e.g. type-binding tests, oracle-first runs)."""
    from udata_datalake_service_spark.entry_queries import ensure_zipf_fixture

    ensure_zipf_fixture()
    return dict(ORACLES)
