"""Scalar function surface (SURVEY §2.9).

Everything here is a *column-expression factory*: it returns Spark Column
objects built from ``pyspark.sql.functions`` so the work stays JVM-side in
whole-stage codegen. Python/pandas UDFs appear only where semantics force
them (verbal-date fallback) and are kept off the hot path.
"""

from udata_datalake_service_spark.functions.casting import (  # noqa: F401
    normalize_number,
    smart_cast,
    str2bool_col,
)
from udata_datalake_service_spark.functions.dates import (  # noqa: F401
    parse_date_multi,
    parse_datetime_multi,
)
from udata_datalake_service_spark.functions.hashing import (  # noqa: F401
    hash64,
    md5_table_name,
    minhash_hex,
)
from udata_datalake_service_spark.functions.http import (  # noqa: F401
    header,
    is_valid_status,
    lower_keys,
    split_content_type,
)
from udata_datalake_service_spark.functions.urls import domain_of  # noqa: F401
