"""HTTP-shaped scalar helpers (F8/F10/F11, SURVEY §2.9).

- ``lower_keys`` — header maps are stored with lower-cased keys
  (crawl/helpers.py:24-35); pure ``transform_keys``.
- ``header`` — JSONB ``headers->>'k'`` extraction (analysis/resource.py:237)
  as plain map access on MapType columns.
- ``split_content_type`` — 'text/csv; charset=utf-8' → 'text/csv'
  (crawl/helpers.py:9-21).
- ``is_valid_status`` — tri-state availability: 200≤s<400 → true,
  429 → NULL (backoff, not availability), else false
  (crawl/helpers.py:56-63 — the tri-state is a deliberate reference trap,
  SURVEY §7.3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def lower_keys(map_col: Column) -> Column:
    return F.transform_keys(map_col, lambda k, _v: F.lower(k))


def header(headers_col: Column, name: str) -> Column:
    return headers_col[name.lower()]


def split_content_type(col: Column) -> Column:
    return F.trim(F.split(col, ";")[0])


def is_valid_status(status_col: Column) -> Column:
    s = status_col.cast("int")
    return (
        F.when(s == 429, F.lit(None).cast("boolean"))
        .when((s >= 200) & (s < 400), F.lit(True))
        .when(s.isNotNull(), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


_CSV_CT = ("application/csv", "text/plain", "text/csv")
_GZ_CT = ("application/octet-stream", "application/x-gzip", "application/gzip")
_XLS_CT = ("application/vnd.ms-excel",)
_XLSX_CT = ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",)


def _starts_any(col: Column, prefixes: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for p in prefixes:
        cond = cond | col.startswith(p)
    return cond


def sniff_tabular(content_type: Column, url: Column) -> Column:
    """S9 — (is_tabular, format) from content-type (+ url for csv.gz)
    — the when-cascade form of utils/csv.py:4-43. Returns a struct
    ``(is_tabular boolean, format string)``; the reference's fallthrough
    is (False, 'csv')."""
    ct = F.lower(F.coalesce(content_type, F.lit("")))
    fmt = (
        F.when(_starts_any(ct, _CSV_CT), F.struct(F.lit(True).alias("is_tabular"), F.lit("csv").alias("format")))
        .when(
            _starts_any(ct, _GZ_CT) & F.coalesce(url, F.lit("")).contains("csv.gz"),
            F.struct(F.lit(True).alias("is_tabular"), F.lit("csvgz").alias("format")),
        )
        .when(_starts_any(ct, _XLS_CT), F.struct(F.lit(True).alias("is_tabular"), F.lit("xls").alias("format")))
        .when(_starts_any(ct, _XLSX_CT), F.struct(F.lit(True).alias("is_tabular"), F.lit("xlsx").alias("format")))
        .otherwise(F.struct(F.lit(False).alias("is_tabular"), F.lit("csv").alias("format")))
    )
    return fmt


@F.pandas_udf(StringType())
def _fix_surrogates_udf(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        return str(v).encode("utf-8", "surrogateescape").decode("utf-8", "replace")

    return s.map(one)


def fix_surrogates(col: Column) -> Column:
    """F7 — unicode surrogate repair (crawl/helpers.py:38-44): lone/low
    surrogates from mis-decoded headers become U+FFFD. Inherently a Python
    codec operation → Arrow-batched pandas UDF, applied only to header
    columns at ingest (never in a query hot path)."""
    return _fix_surrogates_udf(col)
