"""O4 — the csv-sample report (cli.py:181-219 ``csv_sample``).

Reference shape: J1 latest-check join + a predicate stack (content-type
LIKE '%csv%', 2xx/3xx status, header content-length ≤ max_size), then TWO
strata sampled ``ORDER BY RANDOM() LIMIT size/2`` — external domains
(minus ODS-datastore URLs and the portal's own static domain) and the own
domain — unioned.

Spark-first notes: the join broadcasts whichever side AQE finds small
after the filters; sampling is a per-stratum TakeOrderedAndProject on a
seeded md5 key — deterministic (replayable by the DuckDB oracle, stable
across retries of a failed stage) where ``ORDER BY RANDOM()`` is not,
with the same marginal distribution when the seed varies per run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ODS_URL_PATTERNS = ("%/explore/dataset/%", "%/api/datasets/1.0/%")
OWN_DOMAIN = "static.data.gouv.fr"


def sample_key(seed: str, col: Column) -> Column:
    """Seeded deterministic stand-in for ORDER BY RANDOM() (same idiom as
    plans/select_batch)."""
    return F.md5(F.concat(F.lit(seed), col.cast("string")))


def csv_sample(
    catalog: DataFrame,
    checks: DataFrame,
    size: int = 1000,
    max_size: int = 104_857_600,
    own_domain: str = OWN_DOMAIN,
    seed: str = "s0",
) -> DataFrame:
    """(resource_id, dataset_id, url, content_type, content_length) sample,
    half external / half own-domain."""
    joined = (
        catalog.join(checks, catalog["last_check"] == checks["id"])
        .select(
            catalog["resource_id"],
            catalog["dataset_id"],
            checks["url"],
            checks["headers"]["content-type"].alias("content_type"),
            checks["headers"]["content-length"].cast("long").alias("content_length"),
            checks["status"],
            checks["domain"],
        )
        .filter(
            F.col("content_type").like("%csv%")
            & (F.col("status") >= 200)
            & (F.col("status") < 400)
            & (F.col("content_length") <= max_size)
        )
    )
    half = size // 2
    key = sample_key(seed, F.col("resource_id"))

    external = joined
    for p in ODS_URL_PATTERNS:  # "correctly formatted from a datastore"
        external = external.filter(~F.col("url").like(p))
    external = external.filter(F.col("domain") != own_domain)
    own = joined.filter(F.col("domain") == own_domain)

    cols = ["resource_id", "dataset_id", "url", "content_type", "content_length"]
    return (
        external.orderBy(key).limit(half).select(*cols)
        .unionByName(own.orderBy(key).limit(half).select(*cols))
    )
