"""Ad-hoc profiler: time a named entry query twice (cold plan vs warm)."""

from __future__ import annotations

import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf hint resolution)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from udata_datalake_service_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(master="local[32]")
    spark.range(10).write.format("noop").mode("overwrite").save()
    qs = entry_mod.queries()
    names = sys.argv[1:] or ["f3_smart_cast"]
    for name in names:
        fn = qs[name]
        for run in ("cold", "warm"):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_plan = time.time() - t0
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            print(
                f"{name:28s} {run}: build={t_plan:6.3f}s exec={time.time() - t1:6.3f}s"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
