"""Query-layer operators (SURVEY §2.3-§2.7).

``core`` holds the generic relational shapes (top-k groups, latest-per-key,
conditional aggregates, deterministic sampling, merge/upsert); ``checks``
binds them into the reference's concrete API semantics over the
catalog/checks tables; ``gc`` and ``profile`` cover maintenance and
profiling planes.
"""

from udata_datalake_service_spark.operators.core import (  # noqa: F401
    count_over_all,
    deterministic_sample,
    latest_per_key,
    pct_histogram,
    top_k_groups,
    top_n_per_key,
    union_tiers,
    upsert,
)
