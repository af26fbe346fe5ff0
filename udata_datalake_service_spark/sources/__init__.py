"""Sources (SURVEY §2.1): dialect-aware CSV reading, schema inference,
catalog loading."""

from udata_datalake_service_spark.sources.csv_reader import read_csv_with_dialect  # noqa: F401
from udata_datalake_service_spark.sources.inference import inspect_csv  # noqa: F401
