"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode/feature libraries (Pillow, ffmpeg, torchaudio…) are NOT in this
container, so the *decode kernels* are stubs — a clearly-marked
deterministic fake behind the same signature a real kernel would have. The
Spark-side plumbing is real and tested: typed schemas, ``mapInPandas``
batch iteration (Arrow), partition sizing, and the metadata projection.

At 100 TB the pattern is: binaries live in parquet/lance files with a
``content binary`` column; decode runs as ``mapInPandas`` so one Python
worker processes a whole Arrow batch; CPU-heavy kernels get
``spark.task.cpus`` or a repartition to match decoder parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[int, int, list[float]]:
    """STUB — a real implementation would be Pillow/libvips decode.

    Deterministic fake: derives a plausible (width, height) and an 8-bin
    byte-value histogram from the raw bytes so the pipeline shape (schema,
    batching, joins downstream) is fully exercised. Replace the body with
    ``PIL.Image.open(io.BytesIO(content))`` in production.
    """
    if content is None:
        raise NotImplementedError("real decoder required for NULL-content media")
    n = len(content)
    width = 64 + (n % 512)
    height = 64 + ((n // 7) % 512)
    hist = [0.0] * 8
    for byte in content[:4096]:
        hist[byte >> 5] += 1.0
    total = sum(hist) or 1.0
    return width, height, [h / total for h in hist]


def extract_image_features(media: DataFrame) -> DataFrame:
    """``mapInPandas`` feature extraction over binary content.

    One Arrow batch in → one pandas frame out; no per-row Python call
    overhead at the Spark boundary. Output schema is fixed/typed so
    downstream joins and writes are planned normally.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                w, h, hist = _decode_image_stub(bytes(content))
                rows.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "n_bytes": len(content),
                        "sha": hashlib.sha1(bytes(content)).hexdigest(),
                        "histogram": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return media.filter(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        # integer ms: float rounding differs across engines (Python bankers
        # vs DuckDB half-away) — integer math keeps the oracle exact
        T.StructField("duration_ms", T.LongType()),
    ]
)


def _decode_audio_stub(content: bytes, target_rate: int) -> tuple[int, int, int]:
    """STUB — a real implementation would be soundfile/torchaudio decode +
    resample to ``target_rate``. Deterministic fake: treats the payload as
    16-bit PCM mono, so every derived number is plain byte arithmetic the
    DuckDB oracle can replay. Replace with a real decoder in production."""
    if content is None:
        raise NotImplementedError("real decoder required for NULL-content media")
    n_samples = len(content) // 2
    return n_samples, target_rate, n_samples * 1000 // target_rate


def extract_audio_features(media: DataFrame, target_rate: int = 16000) -> DataFrame:
    """``mapInPandas`` audio decode/resample plumbing (same shape as the
    image path: one Arrow batch per Python call, fixed typed output)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                n_samples, rate, dur_ms = _decode_audio_stub(raw, target_rate)
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(raw),
                        "n_samples": n_samples,
                        "sample_rate": rate,
                        "duration_ms": dur_ms,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    return media.filter(F.col("kind") == "audio").select("media_id", "content").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def resize_image_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """``mapInPandas`` binary→binary transform signature (resize kernel).

    STUB body: a real kernel decodes, resizes, re-encodes. The fake emits a
    deterministic payload (target dims + content sha1) so batch shape,
    binary output schema, and downstream writes are exercised for real."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.sha1(bytes(content)).digest()
                rows.append(
                    {
                        "media_id": media_id,
                        "content": b"RESIZED:%dx%d:" % (width, height) + digest,
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return media.filter(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        batches, out_schema
    )


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_ts) rows from the
    duration metadata — the real frame grab is the stubbed decode kernel.
    Pure DataFrame sequence/explode; no Python in the row path."""
    dur = F.col("meta")["duration_s"].cast("double")
    return (
        media.filter((F.col("kind") == "video") & dur.isNotNull())
        .withColumn(
            "frame_ts",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(dur).cast("int"),
                    F.lit(every_n_seconds),
                )
            ),
        )
        .select("media_id", "frame_ts")
    )


def fake_media_from_documents(documents: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture (the
    container ships no binary corpus): content = utf-8 bytes of the text.
    Lets every plumbing test and query run on real Spark binary columns."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.create_map(F.lit("origin"), F.lit("synthetic")).alias("meta"),
    )
