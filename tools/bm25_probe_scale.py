"""BM25 probe-leg scaling vs CORPUS size (VERDICT r11 task 6).

The commit path is measured flat (SOAK.md: per-epoch wall constant
while the postings table grew ×16) and `bm25_topk` has alpha 0.17 on
the legacy fixture at ×1–×16 — but the PROBE leg (matched-postings
semi-join + df partial-agg + fixed-point scoring) is the term that
grows with corpus size, and it had no ×64/×256 point. This tool grows
the CORPUS (not epochs) on the natural-statistics fixture and times
the probe leg alone, with and without the ``max_df_ratio`` posting-
list cap.

Fixture (llm/synthtext): 5 000 Zipf-docs base, scaled ×N with
letters-only salts on words ≥3 chars. Stopwords (<3 chars are rare;
the function-word head is mostly 2-4 chars — salted at ≥3) — so the
probe sees BOTH regimes: terms whose posting lists grow ∝ corpus
(unsalted short head words) and terms whose lists stay constant
(salted content words). That is exactly the skew `max_df_ratio`
exists for: the hot lists are stopword-grade (near-zero idf) and the
cap drops them without changing top-k materially.

Two probe shapes per scale, both over a PRE-BUILT postings frame so
index construction is excluded from the timing:
  * sparse — 3 mid-frequency terms per query (an eval question);
  * dense  — whole base-doc text per query (~hundreds of terms).

Prints a markdown table with wall seconds and per-leg alpha
(log-ratio of wall growth per ×4 corpus growth; alpha 1 = linear).
Paste into SCALE.md.

Usage: python tools/bm25_probe_scale.py [max_scale] [reps]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import shutil

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.llm.retrieval import (
        bm25_postings,
        bm25_stats,
        bm25_topk,
    )
    from udata_datalake_service_spark.llm.synthtext import zipf_documents
    from udata_datalake_service_spark.session import get_spark

    spark = get_spark()
    root = "/tmp/spark_hydra_bm25_probe"
    shutil.rmtree(root, ignore_errors=True)

    n0 = 5000
    zipf_documents(spark, n0, seed="probe-zipf", num_partitions=32).write.mode(
        "overwrite"
    ).parquet(f"{root}/base")
    base = spark.read.parquet(f"{root}/base")

    # sparse probes: 3 content words drawn from one base doc each (the
    # salted tiers never collide with these, so list sizes for content
    # terms stay flat while head-word lists grow with the corpus)
    sample = base.filter(F.col("doc_id") < 20).select("doc_id", "text").collect()
    sparse_rows = []
    for r in sample[:8]:
        ws = [w for w in r["text"].split() if len(w) >= 6][:3]
        if len(ws) == 3:
            sparse_rows.append((r["doc_id"], " ".join(ws)))
    sparse = spark.createDataFrame(sparse_rows, "query_id long, text string")
    dense = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in sample[:8]],
        "query_id long, text string",
    )

    def build_corpus(scale: int) -> None:
        parts = []
        for i in range(scale):
            body = (
                F.col("text")
                if i == 0
                else F.regexp_replace(F.col("text"), r"([A-Za-z]{3,})", f"$1x{i}")
            )
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * n0)).alias("doc_id"),
                    body.alias("text"),
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(f"{root}/corpus")

    def probe_wall(postings, stats, qdf, cap) -> float:
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            bm25_topk(
                None, qdf, k=10, postings=postings, stats=stats,
                max_df_ratio=cap,
            ).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    scales, table = [], []
    s = 1
    while s <= max_scale:
        scales.append(s)
        s *= 4
    for scale in scales:
        build_corpus(scale)
        corpus = spark.read.parquet(f"{root}/corpus")
        # the probe leg reads a PRE-BUILT index: materialize postings
        # once per scale so the timing excludes index construction
        bm25_postings(corpus).write.mode("overwrite").parquet(f"{root}/postings")
        postings = spark.read.parquet(f"{root}/postings")
        n_post = postings.count()
        # ADVICE r12 medium: bm25_stats(corpus) is lazy — leaving it as a
        # plan would make every timed rep re-scan and re-tokenize the
        # whole corpus for the 1-row stats aggregate, silently adding an
        # O(corpus) term to the "probe leg only" wall. Materialize the
        # single row once per scale and rebuild it as a literal frame so
        # the timed region contains ONLY the probe join.
        stats_row = bm25_stats(corpus).collect()[0]
        stats = spark.createDataFrame([stats_row], bm25_stats(corpus).schema)
        row = {"scale": scale, "n_post": n_post}
        for qname, qdf in (("sparse", sparse), ("dense", dense)):
            for cap in (None, 0.1):
                w = probe_wall(postings, stats, qdf, cap)
                row[f"{qname}_{'cap' if cap else 'uncap'}"] = w
        table.append(row)
        print(
            f"x{scale}: {n_post} postings; "
            + ", ".join(
                f"{k}={v:.2f}s" for k, v in row.items() if k not in ("scale", "n_post")
            ),
            flush=True,
        )

    def alpha(col: str) -> float:
        a, b = table[0][col], table[-1][col]
        return math.log(b / a) / math.log(table[-1]["scale"] / table[0]["scale"])

    print("\n| scale | postings | sparse uncap | sparse cap=0.1 | "
          "dense uncap | dense cap=0.1 |")
    print("|---|---|---|---|---|---|")
    for r in table:
        print(
            f"| ×{r['scale']} | {r['n_post']} | {r['sparse_uncap']:.2f} | "
            f"{r['sparse_cap']:.2f} | {r['dense_uncap']:.2f} | "
            f"{r['dense_cap']:.2f} |"
        )
    if len(table) > 1:
        print(
            f"| alpha | — | {alpha('sparse_uncap'):.2f} | "
            f"{alpha('sparse_cap'):.2f} | {alpha('dense_uncap'):.2f} | "
            f"{alpha('dense_cap'):.2f} |"
        )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
