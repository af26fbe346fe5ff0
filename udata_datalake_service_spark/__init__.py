"""udata_datalake_service_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of opendatateam/udata-datalake-service
(udata-hydra).

The reference is an ingestion + metadata-analytics service whose queries are
SQL strings executed by Postgres. Here every capability is re-expressed as
declarative DataFrame / Spark SQL plans so Catalyst + Tungsten pick the
physical strategy, and the storage layer is a parquet lake designed for a
multi-executor cluster (partitioned appends, broadcastable dims, shuffle-free
where possible).

Layout:
- ``session``    — tuned SparkSession factory (AQE, shuffle partitions, UTC).
- ``schemas``    — fixed StructTypes for catalog/checks/registry + the 7-type map.
- ``functions``  — scalar surface (smart_cast, date chains, url/http helpers).
- ``sources``    — CSV dialect reader, schema-inference engine, catalog loader.
- ``sinks``      — lake writer, registry maintenance, parquet export.
- ``operators``  — the query layer (joins, aggregates, selections, profiling).
- ``plans``      — crawl-plane dataflow (change detection, backoff, next-check).
- ``streaming``  — Structured Streaming variants of the incremental plane.
- ``llm``        — beyond-reference training-data ops (dedup, ANN, text stats).
"""

__version__ = "0.1.0"
