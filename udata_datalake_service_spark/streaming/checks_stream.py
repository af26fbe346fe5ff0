"""The crawl/check plane as Structured Streaming jobs.

The reference's crawler is an infinite asyncio loop (crawl/__init__.py:27-37,
SLEEP_BETWEEN_BATCHES=60) with all state in Postgres. Streaming-native
re-expression:

- ST1 micro-batch loop → file-source ``readStream`` over the checks lake
  with a ``ProcessingTime('60 seconds')`` (or ``availableNow``) trigger.
- ST2 per-domain rate limiting → sliding event-time window count per
  domain with a watermark (reference: COUNT over the last 360 s,
  crawl/helpers.py:80-97).
- ST4/ST5 change detection → per-resource state carrying the previous
  check's signals; ``applyInPandasWithState`` keyed by resource_id replaces
  the lag() window that batch mode uses (plans/change_detection.py).

Note the reference has NO watermark/late-data semantics (processing-time
throughout); watermarks here are the streaming-correct generalization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from udata_datalake_service_spark.schemas import CHECKS_SCHEMA


def stream_checks(spark: SparkSession, checks_dir: str) -> DataFrame:
    """File-source stream over the append-only checks lake directory."""
    return (
        spark.readStream.schema(CHECKS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(checks_dir)
    )


def domain_rate_windows(
    checks_stream: DataFrame,
    period_s: int = 360,
    slide_s: int = 60,
    watermark_s: int = 600,
) -> DataFrame:
    """ST2/A5 — per-domain sliding-window check counts. Downstream joins
    flag windows where count ≥ BACKOFF_NB_REQ."""
    return (
        checks_stream.withWatermark("created_at", f"{watermark_s} seconds")
        .groupBy(
            F.window("created_at", f"{period_s} seconds", f"{slide_s} seconds"),
            F.col("domain"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_checks"),
            F.count_if(F.col("status") == 429).alias("n_429"),
        )
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_modified", T.TimestampType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("seen", T.BooleanType()),
    ]
)

_CHANGE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType()),
        T.StructField("check_id", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("change_status", T.StringType()),
        T.StructField("change_method", T.StringType()),
        T.StructField("is_first_check", T.BooleanType()),
    ]
)


def _detect(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    """Stateful cascade: compare each incoming check against the carried
    previous-signals tuple in the reference's priority order
    (analysis/resource.py:216-267)."""
    if state.exists:
        last_modified, content_length, checksum, seen = state.get
    else:
        last_modified, content_length, checksum, seen = None, None, None, False

    rows = []
    # concat the key's Arrow chunks before the sort — per-chunk sorting
    # would misorder rows straddling a chunk boundary
    chunks = [c for c in pdf_iter if len(c)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["created_at", "id"])
        for r in pdf.itertuples(index=False):
            cur_lm = r.detected_last_modified_at
            if cur_lm is not None and pd.isna(cur_lm):  # NaT → None (state-safe)
                cur_lm = None
            cur_cl = (
                int(r.headers["content-length"])
                if isinstance(r.headers, dict) and r.headers.get("content-length")
                else None
            )
            cur_ck = r.checksum
            status, method = "NO_GUESS", None
            for name, cur, prev in (
                ("last_modified", cur_lm, last_modified),
                ("content_length", cur_cl, content_length),
                ("checksum", cur_ck, checksum),
            ):
                if cur is None or prev is None or pd.isna(cur) or (
                    isinstance(prev, float) and pd.isna(prev)
                ):
                    continue
                status = "HAS_CHANGED" if cur != prev else "HAS_NOT_CHANGED"
                method = name
                break
            rows.append(
                {
                    "resource_id": key[0],
                    "check_id": r.id,
                    "created_at": r.created_at,
                    "change_status": status,
                    "change_method": method,
                    "is_first_check": not seen,
                }
            )
            # overwrite (not coalesce) the carried signals: the reference
            # compares against the previous check ROW (ORDER BY created_at
            # DESC LIMIT 2, analysis/resource.py:216-267) — a missing
            # signal there means NO_GUESS for that method, not "compare
            # with an older check". Keeps stream ≡ batch lag-window
            # (asserted by test_stream_matches_batch_change_detection).
            last_modified, content_length, checksum = cur_lm, cur_cl, cur_ck
            seen = True

    state.update((last_modified, content_length, checksum, seen))
    yield pd.DataFrame(rows, columns=[f.name for f in _CHANGE_OUT_SCHEMA])


def change_detection_stream(checks_stream: DataFrame) -> DataFrame:
    """ST4 as a keyed stateful stream — one state row per resource, arrow
    batches per trigger, no shuffle beyond the keyed exchange."""
    return (
        checks_stream.select(
            "resource_id", "id", "created_at", "detected_last_modified_at",
            "headers", "checksum",
        )
        .groupBy("resource_id")
        .applyInPandasWithState(
            _detect,
            outputStructType=_CHANGE_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
