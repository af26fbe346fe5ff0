"""The parquet lake: converted tables + registry (K1-K8 re-expressed).

Reference flow (analysis/csv.py:144,222-416): per converted resource,
DROP/CREATE a Postgres table named md5(url), COPY the cast rows in, record
the inspection in ``tables_index``, optionally export one parquet file to
MinIO (utils/parquet.py, utils/minio.py).

Spark-native: the lake IS the table store. ``df.write.parquet`` replaces
DDL+COPY (K1/K2) *and* the parquet export (K5/K6) in one partitioned,
streamed write; the registry is an append-only parquet table (K7); delete
= path removal + registry delete (K8). Secondary indexes (K4) have no
Spark equivalent — requested index columns become the write's
``sortWithinPartitions`` order so min/max page stats give scan-time skipping
(the Delta ZORDER analogue available with vanilla parquet).

On a real deployment this class fronts Delta/Iceberg; the public surface
(upsert/append/replace/registry) is format-agnostic by design.
"""

from __future__ import annotations

import json
import shutil
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udata_datalake_service_spark.schemas import TABLES_INDEX_SCHEMA


class Lake:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # ---------------------------------------------------------- tables ----
    def table_path(self, name: str) -> str:
        return str(self.root / "tables" / name)

    def write_table(
        self,
        df: DataFrame,
        name: str,
        index_columns: list[str] | None = None,
        min_lines_for_parquet: int = 0,
        expected_rows: int | None = None,
    ) -> int:
        """K1+K2+K5 — replace-write a converted table.

        ``index_columns`` → sortWithinPartitions before write so parquet
        row-group stats cluster on them (K4's replacement). Returns rowcount
        (the reference's MIN_LINES_FOR_PARQUET floor is honored by callers
        passing it here). ``expected_rows`` lets a caller that already knows
        the count (the inspection's ``total_lines``) skip the extra
        materializing pass — the reference likewise gates parquet export on
        the inspection's line count, not a recount (analysis/csv.py:295-303)."""
        n = expected_rows if expected_rows is not None else df.count()
        if n < min_lines_for_parquet:
            return n
        out = df
        # small tables → one file: 32 near-empty part files cost more to
        # open than to scan, and the index sort becomes a global sort so
        # row-group stats actually bound the key range. Large tables keep
        # their partitioning (the 100 TB path never hits this branch).
        if n <= 1_000_000:
            out = out.coalesce(1)
        if index_columns:
            out = out.sortWithinPartitions(*index_columns)
        out.write.mode("overwrite").parquet(self.table_path(name))
        return n

    def read_table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(name))

    def write_bucketed_table(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: list[str],
        num_buckets: int = 16,
    ) -> str:
        """Bucketed catalog table for co-located joins on hot join keys.

        ``bucketBy`` pre-shuffles ONCE at write time: two tables bucketed
        the same way join with NO Exchange on either side (asserted by the
        physical-plan tests) — at 100 TB that turns every recurring
        join/groupBy on the bucket key into a map-side operation. This is
        the Spark-native replacement for the reference's secondary B-tree
        indexes on join columns (K4, migrations/main/20240926_add_indexes).
        Returns the catalog table name (``saveAsTable`` is required —
        bucket metadata lives in the session catalog, not the files).
        """
        table = f"lake_{name}"
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", self.table_path(name))
            .bucketBy(num_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .saveAsTable(table)
        )
        return table

    def drop_table(self, name: str) -> None:
        """K8 — drop table + registry row."""
        p = Path(self.table_path(name))
        if p.exists():
            shutil.rmtree(p)
        self._delete_registry_rows(name)

    # -------------------------------------------------------- registry ----
    @property
    def registry_path(self) -> str:
        return str(self.root / "tables_index")

    def registry(self) -> DataFrame:
        p = Path(self.registry_path)
        if not p.exists() or not any(p.iterdir()):
            return self.spark.createDataFrame([], TABLES_INDEX_SCHEMA)
        return self.spark.read.parquet(self.registry_path)

    def register(
        self,
        parsing_table: str,
        inspection: dict,
        resource_id: str,
        url: str,
        indexes: dict | None = None,
    ) -> None:
        """K7 — append one registry row (analysis/csv.py:398-408)."""
        row = [
            (
                parsing_table,
                json.dumps(inspection, default=str),
                resource_id,
                url,
                datetime.now(timezone.utc).replace(tzinfo=None),
                json.dumps(indexes or {}),
            )
        ]
        self.spark.createDataFrame(row, TABLES_INDEX_SCHEMA).write.mode(
            "append"
        ).parquet(self.registry_path)

    def _delete_registry_rows(self, parsing_table: str) -> None:
        reg = self.registry()
        remaining = reg.filter(F.col("parsing_table") != parsing_table)
        # rewrite-style delete (Delta would do this transactionally)
        tmp = str(self.root / "_tables_index_tmp")
        remaining.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.registry_path, ignore_errors=True)
        Path(tmp).rename(self.registry_path)

    # ------------------------------------------------------- app tables ----
    def app_table_path(self, name: str) -> str:
        return str(self.root / name)

    def write_app_table(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        """catalog / checks / exceptions storage. ``checks`` callers pass
        partition_by=['check_date'] so retention is partition drops and
        per-date aggregates prune (SURVEY §1.5)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.app_table_path(name))

    def append_app_table(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.app_table_path(name))

    def read_app_table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.app_table_path(name))

    def rewrite_app_table(self, df: DataFrame, name: str) -> None:
        """Read-modify-write of an app table. ``df`` may (and usually does)
        read from the table itself, so a direct overwrite would delete its
        own input mid-scan — write to a temp path, then atomically swap
        (the vanilla-parquet stand-in for Delta's transactional rewrite)."""
        tmp = str(self.root / f"_{name}_rewrite_tmp")
        df.write.mode("overwrite").parquet(tmp)
        target = Path(self.app_table_path(name))
        shutil.rmtree(target, ignore_errors=True)
        Path(tmp).rename(target)
