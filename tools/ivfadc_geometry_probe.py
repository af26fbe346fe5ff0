"""IVFADC at realistic list counts (VERDICT r9 #5).

`ann_ivfpq_topk` runs 16 lists at sf0.1 — toy geometry for the
"sublinear candidates" claim. This probe scales the embeddings table
×64 (~128 k vectors; per-copy array rotation keeps every vector
distinct and norm-preserving), sets ``num_lists ≈ sqrt(N)``, and
measures, for num_probes ∈ {1, 2, 4}:

* recall@10 against the exact brute-force ground truth (32 queries
  spread across copies),
* the measured candidate-set fraction (candidate pairs scanned per
  query / corpus size) — the number the "sublinear" claim rests on,
* wall time per configuration.

Prints a markdown table; paste into SCALE64.md §IVFADC-GEOMETRY.

Usage: python tools/ivfadc_geometry_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SCALE = 64
K = 10
N_QUERIES = 32


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.llm.similarity import (
        assign_nearest_centroid,
        brute_force_topk,
        ivf_pq_topk,
        recall_at_k,
    )
    from udata_datalake_service_spark.session import get_spark

    spark = get_spark()
    root = "/tmp/spark_hydra_ivfgeom"

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = emb.count()
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in range(SCALE):
        r = i % dim
        rot = (
            F.concat(
                F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
            )
            if r
            else F.col("embedding")
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n0)).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(f"{root}/emb")
    corpus = spark.read.parquet(f"{root}/emb")
    n = corpus.count()
    num_lists = int(round(n**0.5))
    stride = max(1, n // N_QUERIES)
    queries = corpus.filter(F.col("vec_id") % stride == 0).limit(N_QUERIES)
    queries.cache().count()
    print(f"corpus N={n}, dim={dim}, num_lists={num_lists} (~sqrt(N))", flush=True)

    t0 = time.monotonic()
    exact = brute_force_topk(corpus, queries, k=K, dim=dim)
    exact.cache()
    n_exact = exact.count()
    t_exact = time.monotonic() - t0
    print(f"exact ground truth: {n_exact} rows, {t_exact:.1f}s", flush=True)

    # candidate fraction is a property of the IVF assignment alone —
    # recompute it once per num_probes with the same public pieces
    # ivf_pq_topk composes (first-num_lists centroids, top-1 corpus
    # assignment, top-p query probing)
    cents = (
        corpus.orderBy("vec_id")
        .limit(num_lists)
        .select(F.col("vec_id").alias("__list"), F.col("embedding").cast("array<double>").alias("centroid"))
    )
    assigned = assign_nearest_centroid(
        corpus, cents, vec="embedding", id_col="vec_id", label_col="__list"
    ).select(F.col("vec_id").alias("neighbor_id"), F.col("assigned_label").alias("list_id"))
    assigned.cache().count()

    rows = []
    for num_probes in (1, 2, 4):
        probes = assign_nearest_centroid(
            queries, cents, vec="embedding", id_col="vec_id",
            label_col="__list", top_n=num_probes,
        ).select(F.col("vec_id").alias("query_id"), F.col("assigned_label").alias("list_id"))
        n_cand = probes.join(assigned, on="list_id").count()
        frac = n_cand / (N_QUERIES * n)
        t0 = time.monotonic()
        approx = ivf_pq_topk(
            corpus, queries, k=K, num_lists=num_lists,
            num_probes=num_probes, m=16, dim=dim, rerank=4,
        )
        rec = (
            recall_at_k(exact, approx)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        dt = time.monotonic() - t0
        rows.append((num_probes, n_cand, frac, rec, dt))
        print(
            f"num_probes={num_probes}: candidates/query="
            f"{n_cand / N_QUERIES:.0f} ({frac:.4%} of corpus), "
            f"recall@{K}={rec:.3f}, {dt:.1f}s",
            flush=True,
        )

    print(f"\ncorpus N={n} dim={dim} num_lists={num_lists} queries={N_QUERIES}")
    print("| num_probes | candidates/query | % of corpus | recall@10 | wall s |")
    print("|---|---|---|---|---|")
    for p, n_cand, frac, rec, dt in rows:
        print(
            f"| {p} | {n_cand / N_QUERIES:.0f} | {frac:.3%} | {rec:.3f} | {dt:.1f} |"
        )
    print(f"| exact (brute force) | {n} | 100% | 1.000 | {t_exact:.1f} |")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
