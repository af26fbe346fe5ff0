"""Fixed schemas of the engine's own tables + the 7-type system.

Reference parity (all citations into /root/reference):
- ``catalog``  — migrations/main/20221205_initial_up_rev1.sql:1-11 and
  followups (SURVEY §1.2). One row per resource_id.
- ``checks``   — migrations/main/20221205_initial_up_rev1.sql:13-27 plus the
  parquet/next_check columns. Append-only probe time-series.
- ``tables_index`` registry — migrations/csv/20221205_initial_up_rev1.sql:3-10.
- 7-type system — analysis/csv.py:63-71 (Postgres map) and
  utils/parquet.py:6-14 (Arrow map); here mapped to Spark types, fixing the
  reference's lossy ``datetime → pa.date64`` quirk (SURVEY §7.3).

Scale notes: ``checks`` is the unbounded table — partition by the date of
``created_at`` so retention (P10) is partition drops and the daily aggregate
(A1) prunes to one partition. ``catalog`` is small (~150k rows in prod) and
broadcastable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- status lifecycle enum (db/resource.py:9-19) ---------------------------
RESOURCE_STATUSES = (
    "BACKOFF",
    "CRAWLING_URL",
    "TO_ANALYSE_RESOURCE",
    "ANALYSING_RESOURCE",
    "TO_ANALYSE_CSV",
    "ANALYSING_CSV",
    "INSERTING_IN_DB",
    "CONVERTING_TO_PARQUET",
)  # plus NULL = idle

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),  # serial → assigned monotonic id
        T.StructField("dataset_id", T.StringType()),
        T.StructField("resource_id", T.StringType()),  # UUID
        T.StructField("url", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("last_check", T.LongType()),  # FK checks.id, nullable
        T.StructField("priority", T.BooleanType()),
        T.StructField("harvest_modified_at", T.TimestampType()),
        T.StructField("status", T.StringType()),
    ]
)

CHECKS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("resource_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("status", T.IntegerType()),
        # headers JSONB with lower-cased keys (crawl/helpers.py:24-35)
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("timeout", T.BooleanType()),
        T.StructField("response_time", T.DoubleType()),
        T.StructField("error", T.StringType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("filesize", T.LongType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("analysis_error", T.StringType()),
        T.StructField("detected_last_modified_at", T.TimestampType()),
        T.StructField("parsing_error", T.StringType()),
        T.StructField("parsing_table", T.StringType()),
        T.StructField("parsing_started_at", T.TimestampType()),
        T.StructField("parsing_finished_at", T.TimestampType()),
        T.StructField("next_check_at", T.TimestampType()),
        T.StructField("parquet_url", T.StringType()),
        T.StructField("parquet_size", T.LongType()),
    ]
)

RESOURCES_EXCEPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType()),
        T.StructField("table_indexes", T.MapType(T.StringType(), T.StringType())),
        T.StructField("comment", T.StringType()),
    ]
)

# resources_exceptions: allowlist of oversized resources + requested
# per-table indexes (migrations/main/20240827_add_resources_exceptions_table.sql:5-10)
RESOURCES_EXCEPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType()),  # UUID, unique
        T.StructField("table_indexes", T.StringType()),  # JSON {col: "index"}
        T.StructField("comment", T.StringType()),  # VARCHAR(255)
    ]
)

# tables_index: registry of converted tables (analysis/csv.py:398-408)
TABLES_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("parsing_table", T.StringType()),  # md5(url)
        T.StructField("csv_detective", T.StringType()),  # inspection report JSON
        T.StructField("resource_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("indexes", T.StringType()),  # requested indexes JSON
    ]
)

# --- the 7-type system ------------------------------------------------------
# csv_detective python_type → Spark type (analysis/csv.py:63-81,
# utils/parquet.py:6-14). datetime deliberately TimestampType, not date —
# the reference's pa.date64 mapping truncates time (SURVEY §7.3 trap).
PYTHON_TYPE_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "float": T.DoubleType(),
    "int": T.LongType(),
    "bool": T.BooleanType(),
    "json": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
}

# Columns colliding with Postgres system names are renamed
# "{c}__hydra_renamed" (analysis/csv.py:83,356-360). Kept verbatim for
# output-schema parity even though Spark has no such reserved set.
RESERVED_COLUMN_NAMES = (
    "__id",
    "cmin",
    "cmax",
    "collation",
    "ctid",
    "tableoid",
    "xmin",
    "xmax",
)
RENAME_SUFFIX = "__hydra_renamed"


def renamed(column: str) -> str:
    """Reference rename rule for reserved column names (analysis/csv.py:83)."""
    return f"{column}{RENAME_SUFFIX}" if column in RESERVED_COLUMN_NAMES else column
