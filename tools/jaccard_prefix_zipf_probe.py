"""Stage-attributed probe for the dd_jaccard_prefix ×16 zipf blow-up.

The round-13 zipf scale probe fitted alpha 1.34 for dd_jaccard_prefix
(13.2 / 17.6 / 546.0 s at ×{1,4,16}) — the only super-linear row in
either fixture's table. Per-copy token salting makes the candidate
structure copy-local, so the ALGORITHM is linear in copies; this probe
splits the wall into stages and counts the intermediate frames to find
which physical step breaks:

  index   — shingle_index build + persist (corpus scan)
  dfreq   — per-shingle document frequency aggregate
  docs    — per-doc sorted (df, sh) arrays (collect_list + sort)
  cand    — prefix self-equi-join candidate count
  verify  — length filter + array_intersect survivors

Usage: python tools/jaccard_prefix_zipf_probe.py [scales] [threshold]
e.g. python tools/jaccard_prefix_zipf_probe.py 1,4,16 0.35
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    scales = tuple(
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4,16").split(",")
    )
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35
    k = 2

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.llm.dedup import (
        ngram_jaccard_pairs_prefix,
        shingle_index,
    )
    from udata_datalake_service_spark.llm.synthtext import zipf_documents
    from udata_datalake_service_spark.session import get_spark

    spark = get_spark()
    base = zipf_documents(
        spark, 5000, seed="scale-zipf", num_partitions=32
    ).localCheckpoint(eager=True)
    n0 = base.count()

    for s in scales:
        parts = []
        for i in range(s):
            salted = F.regexp_replace(F.col("text"), r"([A-Za-z0-9]+)", f"$1s{i}")
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * n0)).alias("doc_id"),
                    salted.alias("text"),
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d = d.repartition(32).localCheckpoint(eager=True)

        t0 = time.monotonic()
        sh = shingle_index(d, k=k).persist()
        n_idx = sh.count()
        t_idx = time.monotonic() - t0

        t0 = time.monotonic()
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).persist()
        n_vocab = dfreq.count()
        hot = dfreq.agg(F.max("df")).collect()[0][0]
        t_df = time.monotonic() - t0

        t0 = time.monotonic()
        docs = (
            sh.join(dfreq, on="sh")
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("df", "sh"))).alias("arr"))
            .select(
                "id",
                F.transform("arr", lambda x: x["sh"]).alias("shs"),
                F.size("arr").alias("sz"),
            )
            .persist()
        )
        docs.count()
        t_docs = time.monotonic() - t0

        num = max(int(round(threshold * 1_000_000_000)) - 500, 0)
        pre_len = (
            F.col("sz")
            - F.expr(f"(CAST(sz AS BIGINT) * {num} + 999999999) div 1000000000")
            + 1
        ).cast("int")
        t0 = time.monotonic()
        pre = docs.select("id", F.explode(F.slice("shs", 1, pre_len)).alias("sh"))
        n_pre = pre.count()
        cand = (
            pre.select(F.col("id").alias("id_a"), "sh")
            .join(pre.select(F.col("id").alias("id_b"), "sh"), on="sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .persist()
        )
        n_cand = cand.count()
        t_cand = time.monotonic() - t0

        t0 = time.monotonic()
        full = ngram_jaccard_pairs_prefix(d, k=k, threshold=threshold)
        n_pairs = full.count()
        t_full = time.monotonic() - t0

        print(
            f"| x{s} | idx {n_idx} ({t_idx:.1f}s) | vocab {n_vocab} "
            f"(max df {hot}, {t_df:.1f}s) | docs {t_docs:.1f}s | "
            f"prefix rows {n_pre}, cand {n_cand} ({t_cand:.1f}s) | "
            f"end-to-end pairs {n_pairs} ({t_full:.1f}s) |",
            flush=True,
        )
        for fr in (sh, dfreq, docs, cand):
            fr.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
