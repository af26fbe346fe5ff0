"""S3/S4/S5 — dialect-aware tabular readers.

Reference: utils/reader.py:43-58 reads with a csv.reader configured from
the csv_detective inspection (separator, encoding, header_row_idx);
analysis/csv.py:53-61 maxes the field-size limit. Excel variants
(reader.py:31-41) iterate openpyxl/xlrd.

Spark mapping: ``spark.read.csv`` already handles separator, encoding,
quoting, and gzip transparently (S2); the one semantic gap is
``header_row_idx`` (junk lines *before* the header). That's closed
JVM-side by reading as text, zipping a line index, and dropping the prefix
— no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_with_dialect(
    spark: SparkSession,
    path: str,
    separator: str = ",",
    encoding: str = "UTF-8",
    header_row_idx: int = 0,
    schema: T.StructType | None = None,
    all_strings: bool = False,
) -> DataFrame:
    """Read a CSV honoring a detected dialect.

    ``header_row_idx > 0`` → pre-skip junk lines via a monotonic line index
    computed distributedly (the files the reference handles are ≤100 MB, a
    single partition; the path still works for multi-GB files).

    Encoding names are normalized to Spark 4's charset whitelist
    (iso-8859-1, us-ascii, utf-16/be/le, utf-32, utf-8): the sniffer
    speaks Python codec names ('latin-1', 'utf-8-sig'), which Spark
    REJECTS — without the mapping every latin-1 or BOM'd CSV crashed the
    S6 path at read time (r8 fuzz find). 'utf-8-sig' maps to plain UTF-8
    because Spark's univocity parser strips the BOM itself (verified:
    clean header names); cp1252 degrades to its iso-8859-1 subset.
    """
    enc_map = {
        "utf-8-sig": "UTF-8",
        "latin-1": "ISO-8859-1",
        "latin1": "ISO-8859-1",
        "latin_1": "ISO-8859-1",
        "cp1252": "ISO-8859-1",
        "windows-1252": "ISO-8859-1",
        "ascii": "US-ASCII",
    }
    encoding = enc_map.get(encoding.lower(), encoding)
    reader = (
        spark.read.option("sep", separator)
        .option("encoding", encoding)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("maxCharsPerColumn", -1)  # reference maxes the field limit
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif all_strings:
        reader = reader.option("inferSchema", False)
    else:
        reader = reader.option("inferSchema", True)

    if header_row_idx == 0:
        return reader.csv(path)

    # Drop the pre-header junk lines, then parse with from_csv semantics by
    # round-tripping through the csv datasource on the trimmed text.
    text = spark.read.text(path)
    idx = text.rdd.zipWithIndex().filter(lambda t: t[1] >= header_row_idx).map(
        lambda t: t[0].value
    )
    trimmed = spark.createDataFrame(idx.map(lambda v: (v,)), "value string")
    csv_opts = {
        "sep": separator,
        "header": "true",
        "multiLine": "true",
        "escape": '"',
    }
    if schema is not None:
        return (
            spark.read.options(**csv_opts).schema(schema).csv(trimmed.rdd.map(lambda r: r.value))
        )
    return spark.read.options(**csv_opts).option("inferSchema", not all_strings).csv(
        trimmed.rdd.map(lambda r: r.value)
    )


def read_catalog_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 — national catalog load (cli.py:89-116): ';'-separated export,
    archived datasets skipped."""
    df = (
        spark.read.option("sep", ";")
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    if "dataset.archived" in df.columns:
        df = df.filter(F.col("`dataset.archived`") == "False")
    return df
