"""resources_exceptions — the oversized-resource allowlist.

Reference: db/resource_exception.py (CRUD over the table created by
migrations/main/20240827_add_resources_exceptions_table.sql), served by
routes/resources_exceptions.py:14-55. An exception row:

- bypasses the per-format MAX_FILESIZE_ALLOWED ingest guard
  (analysis/resource.py:49-69, config_default.toml:52-56);
- requests per-column indexes on the converted table
  (analysis/csv.py:124-128,234-250) — only type "index" is supported
  (config_default.toml:59 SQL_INDEXES_TYPES_SUPPORTED); in the Spark lake
  these become the write's sort/clustering columns
  (sinks/lake.write_table(index_columns=…)).

Storage is a small app table on the Lake; all ops are read-modify-write
(a transactional deployment would use Delta MERGE/DELETE).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udata_datalake_service_spark.schemas import RESOURCES_EXCEPTIONS_SCHEMA
from udata_datalake_service_spark.sinks.lake import Lake

TABLE = "resources_exceptions"

# config_default.toml:59 — the reference supports exactly one index type
SQL_INDEXES_TYPES_SUPPORTED = ("index",)

# config_default.toml:52-56 — per-format ingest ceilings (bytes)
MAX_FILESIZE_ALLOWED = {
    "csv": 104_857_600,
    "csvgz": 104_857_600,
    "xls": 52_428_800,
    "xlsx": 13_107_200,
    "ods": 10_485_760,
}


def validate_table_indexes(table_indexes: dict) -> tuple[bool, str | None]:
    """schemas/resource_exception.py:13-28 — dict of {column: index_type}."""
    if not isinstance(table_indexes, dict):
        return False, "table_indexes must be a dictionary"
    for index_type in table_indexes.values():
        if index_type not in SQL_INDEXES_TYPES_SUPPORTED:
            return False, "error, index type must be one of: " + ", ".join(
                SQL_INDEXES_TYPES_SUPPORTED
            )
    return True, None


def max_size_allowed(file_format: str, has_exception: bool) -> int | None:
    """analysis/resource.py:69 — None (unlimited) for exception resources."""
    return None if has_exception else MAX_FILESIZE_ALLOWED[file_format]


def requested_index_columns(exception_row) -> list[str]:
    """analysis/csv.py:124-128 — the columns whose requested type is
    "index", in insertion order; [] when no exception / no indexes."""
    if exception_row is None or not exception_row["table_indexes"]:
        return []
    indexes = json.loads(exception_row["table_indexes"])
    return [c for c, t in indexes.items() if t == "index"]


class ResourceExceptions:
    """CRUD over the allowlist app table (db/resource_exception.py)."""

    def __init__(self, spark: SparkSession, lake: Lake):
        self.spark = spark
        self.lake = lake

    def _table(self) -> DataFrame:
        try:
            return self.lake.read_app_table(TABLE)
        except Exception:  # first access before any insert
            return self.spark.createDataFrame([], RESOURCES_EXCEPTIONS_SCHEMA)

    def get_all(self) -> DataFrame:
        return self._table()

    def get_by_resource_id(self, resource_id: str):
        rows = self._table().filter(F.col("resource_id") == resource_id).collect()
        return rows[0] if rows else None

    def insert(
        self,
        resource_id: str,
        catalog: DataFrame,
        table_indexes: dict | None = None,
        comment: str | None = None,
    ) -> None:
        """db/resource_exception.py:34-67 — validates the resource exists in
        the catalog and the index types are supported."""
        if catalog.filter(F.col("resource_id") == resource_id).limit(1).count() == 0:
            raise ValueError("Resource not found")
        if table_indexes is None:
            table_indexes = {}
        else:
            valid, error = validate_table_indexes(table_indexes)
            if not valid:
                raise ValueError(error)
        row = self.spark.createDataFrame(
            [(resource_id, json.dumps(table_indexes), comment)],
            RESOURCES_EXCEPTIONS_SCHEMA,
        )
        self.lake.append_app_table(row, TABLE)

    def update(
        self, resource_id: str, table_indexes: dict | None = None, comment: str | None = None
    ) -> None:
        if table_indexes is not None:
            valid, error = validate_table_indexes(table_indexes)
            if not valid:
                raise ValueError(error)
        tbl = self._table()
        is_target = F.col("resource_id") == resource_id
        if table_indexes is not None:
            tbl = tbl.withColumn(
                "table_indexes",
                F.when(is_target, F.lit(json.dumps(table_indexes))).otherwise(
                    F.col("table_indexes")
                ),
            )
        if comment is not None:
            tbl = tbl.withColumn(
                "comment", F.when(is_target, F.lit(comment)).otherwise(F.col("comment"))
            )
        self.lake.rewrite_app_table(tbl, TABLE)

    def delete(self, resource_id: str) -> None:
        self.lake.rewrite_app_table(
            self._table().filter(F.col("resource_id") != resource_id), TABLE
        )
