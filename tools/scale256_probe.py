"""×256 probe for the dedup heavyweights (VERDICT r8 task 8).

Extends SCALE64.md one octave: the exact AllPairs/PPJoin path
(``dd_jaccard_prefix``), the MinHash+LSH candidate generator
(``minhash_lsh_pairs``) and the full LSH scorecard (``dd_lsh_eval``)
probed at ×256 of the sf0.1 documents table (~1.28 M docs) with the
same token-salted family-count scaling and GC quiesce as
``scale_probe.py`` — the numbers that turn "use LSH at scale" from a
qualitative note into a measured crossover.

Usage: python tools/scale256_probe.py [sf_dir]
Prints a markdown table; paste into SCALE64.md §SCALE256.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SCALES = (64, 256)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.session import get_spark, require_driver_heap

    spark = get_spark()
    # measured: the x256 legs OOM a default-8g driver ~20 min in; refuse
    # loudly up front instead (VERDICT r10 task 8)
    require_driver_heap(spark, 48, "scale256_probe")
    root = "/tmp/spark_hydra_scale256"

    import os

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    for s in SCALES:
        if os.path.exists(f"{root}/sf_{s}x/documents.parquet/_SUCCESS"):
            print(f"fixture sf_{s}x already present, reusing", flush=True)
            continue
        parts = []
        for i in range(s):
            # same near-bijective per-copy token salt as scale_probe.py:
            # families multiply, family size stays constant
            salted = F.regexp_replace(F.col("text"), r"([A-Za-z0-9]+)", f"$1s{i}")
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                    salted.alias("text"),
                    "lang",
                    "source",
                    F.length(salted).cast("long").alias("n_chars"),
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d.repartition(32).write.mode("overwrite").parquet(
            f"{root}/sf_{s}x/documents.parquet"
        )

    def quiesce():
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)

    from udata_datalake_service_spark.entry_queries import QUERIES
    from udata_datalake_service_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    results: dict[str, dict[int, float]] = {}
    for s in SCALES:
        d = spark.read.parquet(f"{root}/sf_{s}x/documents.parquet")

        def run(name, thunk):
            quiesce()
            t0 = time.monotonic()
            thunk()
            results.setdefault(name, {})[s] = round(time.monotonic() - t0, 2)
            print(f"  {name} @ {s}x: {results[name][s]} s", flush=True)

        run(
            "minhash_lsh_pairs",
            lambda: lsh_candidate_pairs(
                minhash_signatures(d, num_hashes=8, k=2),
                num_bands=4,
                rows_per_band=2,
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        run(
            "dd_lsh_eval",
            lambda: QUERIES["dd_lsh_eval"](spark, f"{root}/sf_{s}x")
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        run(
            "dd_jaccard_prefix",
            lambda: QUERIES["dd_jaccard_prefix"](spark, f"{root}/sf_{s}x")
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    print("\n| operator | t@64x s | t@256x s |")
    print("|---|---|---|")
    for name, row in results.items():
        print(f"| {name} | {row.get(64, '-')} | {row.get(256, '-')} |")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
