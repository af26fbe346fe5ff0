"""Benchmark harness — the driver's per-round feedback loop.

Runs every ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a full collect-free materialization
(``df.write.format("noop")``): every row is produced and shipped through
the plan, but driver-side materialization cost (irrelevant at cluster
scale) is excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry_mod
    from udata_datalake_service_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    t_warm = time.time()
    from udata_datalake_service_spark.session import load_tables

    tables = load_tables(spark, sf_dir)
    for df in tables.values():
        df.limit(1).write.format("noop").mode("overwrite").save()
    # spin up the Python UDF workers once (lazy by default): otherwise the
    # first pandas-UDF query is charged ~3 s of worker startup that every
    # later UDF stage reuses (spark.python.worker.reuse).
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _noop_udf(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).repartition(int(cpus)).select(
        _noop_udf("id")
    ).write.format("noop").mode("overwrite").save()
    warm_sec = time.time() - t_warm

    load_start = os.getloadavg()[0]
    timings: dict[str, float] = {}
    qs = entry_mod.queries()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        # settling wrappers release their own adopted caches (caching.py),
        # but localCheckpoint blocks and any un-settled persist would
        # still linger; clearing between queries keeps 96 sequential
        # queries from stealing each other's execution memory and makes
        # per-query numbers isolation-honest.
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    payload = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "warm_sec": round(warm_sec, 3),
        "n_queries": len(timings),
        # 1-min loadavg at suite start/end: a high start (external
        # load) or big delta flags a noisy run, so round-over-round
        # regressions can be attributed without manual triage
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(payload))
    # the driver's artifact keeps only a ~4 KB tail of stdout, which
    # truncates the per-query map on a 96-query suite; persist the full
    # JSON locally so every round has a complete record.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        n_round = 1 + max(
            [
                int(f[7:9])
                for f in os.listdir(here)
                if f.startswith("BENCH_r") and f.endswith(".json") and f[7:9].isdigit()
            ],
            default=0,
        )
        local = os.path.join(here, f"BENCH_LOCAL_r{n_round:02d}.json")
        with open(local, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"bench: could not write local artifact: {e}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
