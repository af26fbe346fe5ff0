"""S1 — distributed URL check execution (the crawler's fetch step).

Reference: crawl/check_resources.py:56-206 — per URL: HEAD with a 5 s
timeout, falling back to GET when the HEAD response isn't "nice" (invalid
status, or neither content-length nor last-modified present,
crawl/helpers.py:47-53); record status / lowered headers / response_time /
timeout / error; domain from the URL netloc.

Spark-first shape: the claimed batch DataFrame flows through
``mapInPandas`` so each executor partition runs its URLs with one
transport session — the reference's 40-way asyncio concurrency becomes
executor-task parallelism (repartition the batch to the wanted fan-out).
The transport is **pluggable**: tests inject a fake; the default urllib
transport is import-gated and never touched unless actually invoked
(this container has no network).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

REQUEST_TIMEOUT_S = 5.0  # check_resources.py:101

# transport: (url, method) -> (status:int|None, headers:dict, error:str|None)
Transport = Callable[[str, str], tuple[int | None, dict, str | None]]

CHECK_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("timeout", T.BooleanType()),
        T.StructField("response_time", T.DoubleType()),
        T.StructField("error", T.StringType()),
        T.StructField("method", T.StringType()),  # which verb produced the row
    ]
)


def make_urllib_transport(
    cafile: str | None = None, timeout: float | None = None
) -> Transport:
    """Build a real urllib transport. ``cafile`` adds a trust root for
    private-CA deployments (and the self-signed TLS test fixture) — with
    the default None, certificate verification uses the system store, and
    a failed TLS handshake is recorded as the check row's ``error`` (the
    reference's aiohttp envelope records ssl errors the same way,
    crawl/check_resources.py:56-206). The closure is picklable, so it
    ships to executors like any other transport."""

    def transport(url: str, method: str) -> tuple[int | None, dict, str | None]:
        import ssl
        import urllib.error
        import urllib.request

        ctx = ssl.create_default_context(cafile=cafile) if cafile else None
        req = urllib.request.Request(url, method=method.upper())
        try:
            with urllib.request.urlopen(
                req, timeout=timeout or REQUEST_TIMEOUT_S, context=ctx
            ) as resp:
                return resp.status, dict(resp.headers.items()), None
        except urllib.error.HTTPError as e:  # still a response
            return e.code, dict(e.headers.items()), None
        except TimeoutError:
            raise
        except Exception as e:  # noqa: BLE001 — error recorded on the check row
            return None, {}, str(e)

    return transport


def urllib_transport(url: str, method: str) -> tuple[int | None, dict, str | None]:
    """Default real transport (urllib, stdlib-only). Import-gated by being
    invoked lazily on executors; honors the reference's 5 s total timeout."""
    return make_urllib_transport()(url, method)


def _nice_head(status: int | None, headers: dict) -> bool:
    """crawl/helpers.py:47-53 — HEAD is useful only with a valid status AND
    a content-length or last-modified header."""
    if status is None or not (200 <= status < 400):
        return False
    lowered = {k.lower() for k in headers}
    return bool({"content-length", "last-modified"} & lowered)


def _check_one(url: str, transport: Transport) -> dict:
    """HEAD → conditional GET fallback, one result row (fields of
    CHECK_RESULT_SCHEMA minus resource_id)."""

    def fix(v: str) -> str:
        return str(v).encode("utf-8", "surrogateescape").decode("utf-8", "replace")

    domain = urlparse(url).netloc
    method = "head"
    start = time.time()
    try:
        status, headers, error = transport(url, method)
        if not _nice_head(status, headers):
            method = "get"
            status, headers, error = transport(url, method)
        elapsed = time.time() - start
        return {
            "url": url,
            "domain": domain,
            "status": status,
            "headers": {k.lower(): fix(v) for k, v in (headers or {}).items()},
            "timeout": False,
            "response_time": elapsed,
            "error": error,
            "method": method,
        }
    except TimeoutError:
        return {
            "url": url,
            "domain": domain,
            "status": None,
            "headers": {},
            "timeout": True,  # check_resources.py timeout branch
            "response_time": time.time() - start,
            "error": None,
            "method": method,
        }


def check_batch(
    batch: DataFrame,
    transport: Transport = urllib_transport,
    fan_out: int | None = None,
) -> DataFrame:
    """Execute checks for a claimed batch (resource_id, url) distributedly.

    ``fan_out`` repartitions the (tiny) batch so N executor tasks fetch
    concurrently — the Spark analogue of the reference's 40-way asyncio
    session. Output conforms to CHECK_RESULT_SCHEMA; feed it to
    ``plans.change_detection`` / ``next_check`` and append to the checks
    lake.
    """
    src = batch.select("resource_id", "url")
    if fan_out:
        src = src.repartition(fan_out)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CHECK_RESULT_SCHEMA.fields]
        for pdf in it:
            rows = []
            for rid, url in zip(pdf["resource_id"], pdf["url"]):
                row = _check_one(str(url), transport)
                row["resource_id"] = str(rid)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, CHECK_RESULT_SCHEMA)


URL_REPAIR_SCHEMA = T.StructType(
    [
        T.StructField("resource_id", T.StringType()),
        T.StructField("old_url", T.StringType()),
        T.StructField("actual_url", T.StringType()),
    ]
)


def wrong_url_repairs(
    check_results: DataFrame,
    portal_base: str,
    transport: Transport = urllib_transport,
) -> DataFrame:
    """404 → current-URL discovery (check_resources.py:173-231).

    The reference, on a 404, HEADs the portal's stable redirect
    ``{portal}/datasets/r/{resource_id}`` and reads the ``location``
    header — the resource's *current* URL — then rewrites the catalog row
    and re-checks. This is the discovery step as a batch transform: one
    repair row per 404'd resource whose stable redirect points somewhere
    new. Same pluggable-transport ``mapInPandas`` shape as ``check_batch``;
    feed the result to ``apply_url_repairs`` (U4) and re-run the repaired
    rows through ``check_batch``.
    """
    src = check_results.filter(check_results.status == 404).select(
        "resource_id", "url"
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in URL_REPAIR_SCHEMA.fields]
        for pdf in it:
            rows = []
            for rid, url in zip(pdf["resource_id"], pdf["url"]):
                stable = f"{portal_base.rstrip('/')}/datasets/r/{rid}"
                _status, headers, err = transport(stable, "head")
                if err:
                    continue
                loc = {k.lower(): v for k, v in headers.items()}.get("location")
                if loc and loc != url:
                    rows.append(
                        {"resource_id": str(rid), "old_url": url, "actual_url": loc}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, URL_REPAIR_SCHEMA)


def apply_url_repairs(catalog: DataFrame, repairs: DataFrame) -> DataFrame:
    """U4 — rewrite repaired catalog URLs (Resource.update at
    check_resources.py:222). Broadcast left join (repairs are tiny);
    untouched rows pass through unchanged."""
    from pyspark.sql import functions as F

    r = F.broadcast(repairs.select("resource_id", "actual_url"))
    out = catalog.join(r, on="resource_id", how="left")
    return out.withColumn(
        "url", F.coalesce(F.col("actual_url"), F.col("url"))
    ).drop("actual_url")
