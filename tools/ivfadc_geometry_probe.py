"""IVFADC at realistic list counts (VERDICT r9 #5).

`ann_ivfpq_topk` runs 16 lists at sf0.1 — toy geometry for the
"sublinear candidates" claim. This probe scales the embeddings table
×64 (~128 k vectors), sets ``num_lists ≈ sqrt(N)``, and measures
recall@10 + the candidate-set fraction at num_probes ∈ {1, 2, 4} for
first-K and 2-round-trained centroids — on TWO corpora:

* **isotropic** — per-copy array rotation of the synthetic embeddings,
  which are near-isotropic (top-10 neighbor cos ≈ 0.35 vs random 0.0,
  within-label cos ≈ 0). On structureless data IVF recall tracks the
  probed fraction no matter how centroids are trained — the honest
  limit of the method, not of the implementation.
* **clustered** — copy i = base + 0.2·rotate_i(base): 64-member
  families at ~0.95 cosine, cross-family ≈ base-pair cosine. The
  regime real embedding corpora live in; IVF must hit high recall at
  ~1 % candidates here or the composition is broken.

Prints markdown tables; paste into SCALE64.md §IVFADC-GEOMETRY.

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
        label_centroids,
        recall_at_k,
    )
    from udata_datalake_service_spark.session import get_spark

    spark = get_spark()
    root = "/tmp/spark_hydra_ivfgeom"

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = emb.count()
    dim = len(emb.select("embedding").first()[0])
    # the per-copy rotation offset is i % dim: with dim < SCALE, copies i
    # and i+dim would be byte-identical (isotropic) / identical family
    # members (clustered), injecting exact duplicates that skew the
    # recall/candidate-fraction numbers pasted into SCALE64.md (ADVICE
    # r10). Fail loudly rather than publish silently-duplicated geometry.
    assert dim >= SCALE, (
        f"embedding dim {dim} < SCALE {SCALE}: rotation copies would "
        f"repeat every {dim} copies, duplicating vectors — lower SCALE "
        "or use a higher-dimensional embedding table"
    )

    def scaled(mode):
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
            if mode == "isotropic":
                v = rot
            else:  # clustered: tight 64-member family around each base vector
                v = F.zip_with(
                    "embedding", rot, lambda x, y: x + F.lit(0.2) * y
                )
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * n0)).alias("vec_id"),
                    v.cast("array<float>").alias("embedding"),
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(f"{root}/{mode}")
        return spark.read.parquet(f"{root}/{mode}")

    all_rows = {}
    for mode in ("isotropic", "clustered"):
        corpus = scaled(mode)
        n = corpus.count()
        num_lists = int(round(n**0.5))
        stride = max(1, n // N_QUERIES)
        queries = corpus.filter(F.col("vec_id") % stride == 0).limit(N_QUERIES)
        queries.cache().count()
        print(f"[{mode}] N={n}, dim={dim}, num_lists={num_lists}", flush=True)

        t0 = time.monotonic()
        exact = brute_force_topk(corpus, queries, k=K, dim=dim)
        exact.cache()
        exact.count()
        t_exact = time.monotonic() - t0
        mean_cos = exact.agg(F.avg("cos")).collect()[0][0]
        print(
            f"[{mode}] exact ground truth {t_exact:.1f}s, "
            f"mean top-{K} cos {mean_cos:.3f}",
            flush=True,
        )

        cents = (
            corpus.orderBy("vec_id")
            .limit(num_lists)
            .select(
                F.col("vec_id").alias("__list"),
                F.col("embedding").cast("array<double>").alias("centroid"),
            )
        )

        def train(seed_cents):
            t0 = time.monotonic()
            tr = seed_cents.select(F.col("__list").alias("label"), "centroid")
            for _ in range(2):
                a = assign_nearest_centroid(
                    corpus,
                    tr.select(F.col("label").alias("__list"), "centroid"),
                    vec="embedding",
                    id_col="vec_id",
                    label_col="__list",
                )
                tr = (
                    label_centroids(
                        corpus.select("vec_id", "embedding")
                        .join(
                            a.select(
                                "vec_id", F.col("assigned_label").alias("__lbl")
                            ),
                            on="vec_id",
                        )
                        .select("embedding", F.col("__lbl").alias("label")),
                        vec="embedding",
                        label_col="label",
                    )
                    .select("label", "centroid")
                    .localCheckpoint(eager=True)
                )
            print(
                f"[{mode}] trained centroids: {tr.count()} live, "
                f"{time.monotonic() - t0:.1f}s",
                flush=True,
            )
            return tr

        trained = train(cents)

        def assignment(c):
            a = assign_nearest_centroid(
                corpus, c, vec="embedding", id_col="vec_id", label_col="__list"
            ).select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("assigned_label").alias("list_id"),
            )
            a.cache().count()
            return a

        rows = []
        for label, cfg_cents in (("first-K", None), ("trained-2r", trained)):
            probe_cents = (
                cents
                if cfg_cents is None
                else cfg_cents.select(F.col("label").alias("__list"), "centroid")
            )
            cfg_assigned = assignment(probe_cents)
            for num_probes in (1, 2, 4):
                probes = assign_nearest_centroid(
                    queries,
                    probe_cents,
                    vec="embedding",
                    id_col="vec_id",
                    label_col="__list",
                    top_n=num_probes,
                ).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("assigned_label").alias("list_id"),
                )
                n_cand = probes.join(cfg_assigned, on="list_id").count()
                frac = n_cand / (N_QUERIES * n)
                t0 = time.monotonic()
                approx = ivf_pq_topk(
                    corpus,
                    queries,
                    k=K,
                    num_lists=num_lists,
                    num_probes=num_probes,
                    m=16,
                    dim=dim,
                    rerank=4,
                    centroids=cfg_cents,
                )
                rec = (
                    recall_at_k(exact, approx)
                    .agg(F.avg("recall").alias("r"))
                    .collect()[0]["r"]
                )
                dt = time.monotonic() - t0
                rows.append((label, num_probes, n_cand, frac, rec, dt))
                print(
                    f"[{mode}] {label} probes={num_probes}: "
                    f"cand/query={n_cand / N_QUERIES:.0f} ({frac:.4%}), "
                    f"recall@{K}={rec:.3f}, {dt:.1f}s",
                    flush=True,
                )
            cfg_assigned.unpersist()
        all_rows[mode] = (n, num_lists, mean_cos, t_exact, rows)
        exact.unpersist()
        queries.unpersist()

    for mode, (n, num_lists, mean_cos, t_exact, rows) in all_rows.items():
        print(
            f"\n### {mode} (N={n}, num_lists={num_lists}, "
            f"mean top-{K} cos {mean_cos:.3f})"
        )
        print("| centroids | num_probes | cand/query | % of corpus | recall@10 | wall s |")
        print("|---|---|---|---|---|---|")
        for label, p, n_cand, frac, rec, dt in rows:
            print(
                f"| {label} | {p} | {n_cand / N_QUERIES:.0f} | {frac:.3%} "
                f"| {rec:.3f} | {dt:.1f} |"
            )
        print(f"| exact brute force | — | {n} | 100% | 1.000 | {t_exact:.1f} |")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
