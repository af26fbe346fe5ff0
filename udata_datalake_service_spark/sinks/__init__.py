"""Sinks (SURVEY §2.2): the parquet lake, registry maintenance, export."""

from udata_datalake_service_spark.sinks.lake import Lake  # noqa: F401
