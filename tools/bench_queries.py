"""Time a handful of registry queries against an arbitrary repo checkout.

The measurement half of `bench_diff.py --attribute` (VERDICT r12 task 7):
the same queries are timed from a worktree of the previous bench's commit
AND from HEAD, same machine, same session of the day — so a
round-over-round inflation can be attributed to code vs host drift
without prose. Runs as a subprocess per checkout (a clean sys.path and a
fresh JVM per side; mixing two checkouts in one interpreter would let
the first import win).

    python tools/bench_queries.py --repo /path/to/checkout \
        --sf /root/testdata/sf0.1 --reps 3 q1 q2 q3

Prints ONE JSON line {query: median_sec}; failures print -1 for that
query. Mirrors bench.py's protocol: noop-sink action, clearCache between
executions, one untimed warm-up execution per query.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import __spark_entry__ as entry_mod
    from udata_datalake_service_spark.session import get_spark, load_tables

    spark = get_spark(master=f"local[{args.cpus}]")
    # same warm protocol as bench.py: parquet footers + python workers
    for df in load_tables(spark, args.sf).values():
        df.limit(1).write.format("noop").mode("overwrite").save()
    qs = entry_mod.queries()

    def run_once(name: str) -> float:
        t0 = time.time()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    out: dict[str, float] = {}
    for name in args.queries:
        if name not in qs:
            out[name] = -1.0
            continue
        try:
            run_once(name)  # warm-up, untimed
            samples = [run_once(name) for _ in range(args.reps)]
            out[name] = round(statistics.median(samples), 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench_queries error in {name}: {e}", file=sys.stderr)
            out[name] = -1.0
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
