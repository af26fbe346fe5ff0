"""Incremental (streaming) exact dedup over a growing document corpus.

Batch ``llm.dedup.exact_dedup`` answers "dedup this corpus"; a training-data
ingest pipeline needs the INCREMENTAL form — "emit each newly-arrived
document unless its content was already seen in ANY earlier batch". That is
exactly Structured Streaming's stateful ``dropDuplicates``: the state store
carries one row per fingerprint seen so far, each micro-batch anti-joins
against it, and survivors extend it. First arrival wins (the streaming
analogue of batch's min-id winner — equal when arrival order follows id
order, asserted by test_streaming.py).

Scale notes: state is one (fingerprint) row per DISTINCT document ever seen
— unbounded on an unbounded stream. The production bound is
``exact_dedup_stream_watermarked``: ``dropDuplicatesWithinWatermark`` keeps
a fingerprint only until the watermark passes it, i.e. "no verbatim re-crawl
within the horizon", which matches how crawl-window dedup is actually run.
State lives in the checkpoointed state store (RocksDB at scale), partitioned
by fingerprint hash — the shuffle is on the 32-char fingerprint only, text
never enters state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udata_datalake_service_spark.llm.text import fingerprint

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(
    spark: SparkSession, docs_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an append-only documents directory."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )


def exact_dedup_stream(
    doc_stream: DataFrame, text: str = "text", fp_col: str = "fp"
) -> DataFrame:
    """Cross-batch exact dedup: first document per canonical fingerprint
    ever seen survives; later verbatim re-arrivals (same batch or any
    later one) are dropped. Unbounded state — one row per distinct
    fingerprint; prefer the watermarked variant on endless streams."""
    return doc_stream.withColumn(fp_col, fingerprint(F.col(text))).dropDuplicates(
        [fp_col]
    )


def exact_dedup_stream_watermarked(
    doc_stream: DataFrame,
    ts_col: str,
    horizon: str = "1 hour",
    text: str = "text",
    fp_col: str = "fp",
) -> DataFrame:
    """Bounded-state variant: a fingerprint is remembered only while it is
    inside the ``horizon`` watermark — "no verbatim duplicate within the
    re-crawl window" semantics, with state that can't grow past the
    horizon's arrival volume."""
    return (
        doc_stream.withColumn(fp_col, fingerprint(F.col(text)))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark([fp_col])
    )
