"""Microbench: the near-dup stream's signatures phase, by hash family
and expression shape.

The zipf ×16 soak attributes 57-65 % of stream wall to
``minhash_signatures``; this probe times JUST that job (localCheckpoint
materialization barrier, median of reps) on one soak-sized micro-batch
of zipf synthtext docs, for each candidate implementation:

* md5        — the r12 baseline (string shingles, 8 seeded md5 MINs)
* xxh64      — the slice-hash family (`hash_family="xxh64"`)

plus diagnostic shapes:

* inline-shingles — explode(distinct word_shingles(text)) and count:
  the PRE-r13 expression shape, where the tokens(text) subtree sits
  inside the transform lambda and is re-split per shingle window on
  the interpreted higher-order path. Kept as the regression control —
  if this row ever gets CLOSE to the family rows, the token-column
  projection has been lost (e.g. to a project-collapse rule change).
* md5-tokcol / xxh64-tokcol — hand-inlined token-column variants
  (the shape the library now uses); should match the family rows.

Usage: python tools/minhash_family_probe.py [n_docs] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.llm.dedup import (
        minhash_signatures,
        word_shingles,
    )
    from udata_datalake_service_spark.llm.synthtext import zipf_documents
    from udata_datalake_service_spark.llm.text import tokens
    from udata_datalake_service_spark.session import get_spark

    spark = get_spark()
    docs = zipf_documents(
        spark, n_docs, seed="family-probe", num_partitions=32
    ).localCheckpoint(eager=True)
    print(f"{docs.count()} docs, reps={reps}", flush=True)

    def timed(name, build):
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            out = build().localCheckpoint(eager=True)
            walls.append(time.monotonic() - t0)
            out.unpersist()
            spark.sparkContext._jvm.System.gc()
        walls.sort()
        med = walls[len(walls) // 2]
        print(f"| {name} | {med:.2f} |", flush=True)
        return med

    k, num_hashes = 2, 8

    timed("md5", lambda: minhash_signatures(
        docs, num_hashes=num_hashes, k=k, hash_family="md5"))
    timed("xxh64", lambda: minhash_signatures(
        docs, num_hashes=num_hashes, k=k, hash_family="xxh64"))

    # ---- diagnostics ----
    def shingle_only():
        return docs.select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.array_distinct(word_shingles(F.col("text"), k))
            ).alias("sh"),
        ).groupBy("id").agg(F.count(F.lit(1)).alias("n"))

    timed("inline-shingles (pre-r13 shape)", shingle_only)

    def tokcol(family):
        # materialize the token array first: the transform lambda then
        # references a bound attribute, not the tokens(text) subtree
        base = docs.select(
            F.col("doc_id").alias("id"), tokens(F.col("text")).alias("t")
        )
        toks = F.col("t")
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        if family == "xxh64":
            sh64s = F.when(
                n >= k,
                F.transform(idx, lambda i: F.xxhash64(F.slice(toks, i + 1, k))),
            ).otherwise(F.array(F.xxhash64(toks)))
            sh = base.select("id", F.explode(F.array_distinct(sh64s)).alias("sh"))
            mins = [
                F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"__h{i}")
                for i in range(num_hashes)
            ]
        else:
            shs = F.when(
                n >= k,
                F.transform(
                    idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
                ),
            ).otherwise(F.array(F.array_join(toks, " ")))
            sh = base.select("id", F.explode(F.array_distinct(shs)).alias("sh"))
            mins = [
                F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"__h{i}")
                for i in range(num_hashes)
            ]
        return sh.groupBy("id").agg(*mins).select(
            "id",
            F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig"),
        )

    timed("md5-tokcol", lambda: tokcol("md5"))
    timed("xxh64-tokcol", lambda: tokcol("xxh64"))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
