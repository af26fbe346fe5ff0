"""Measured scaling curves for the headline corpus operators.

"Would this hold at 100×?" answered with data instead of assertion: the
sf0.1 documents/embeddings tables are materialized at 1×/4×/16× (copies
id-shifted and TOKEN-salted), each probe runs warm on the same session,
and the fitted growth exponent alpha (t ∝ n^alpha) lands in SCALE.md.
Linear-ish operators (alpha ≈ 1) scale with the corpus; anything
super-linear is flagged.

Salting model (round-7 fix): every alphanumeric run of copy *i* gets
the suffix ``s<i>`` appended DIRECTLY (no separator — the corpus
tokenizer splits on ``[^a-z0-9]+``, so a separator would turn the salt
into its own ultra-common token). This is a near-bijective token mapping
per copy: within a copy, similarity structure (shingle sets, near-dup
families, token distributions) is preserved; across copies, token
vocabularies are disjoint, so copies of the same document share zero
shingles. The scale-up therefore grows the NUMBER of duplicate families
at constant family size — the control an engine probe needs. Rejected
designs, measured: the r6 prefix salt ("c<i> " prepended) left copies
near-dups of EACH OTHER, so families grew 16× and pair-producing
operators faced 256× pairs by construction (its 16× dd_jaccard_prefix
probe ran >10 minutes on fixture-created verification work); separator
salts ("w1 s<i> w2 s<i>" or "w1_s<i>") tokenize into an interleaved
common token that collapses shingle distinctiveness — LSH candidate
pairs measured 45,695 (raw) vs 64,420 (suffix salt) vs 10,370,321
(separator salt) on the same 1× corpus. An accidental engine quadratic
(cartesian, unbucketed join) still pushes alpha toward 2 under
family-count scaling and stays unmistakable.

Two probe groups:
* library primitives (exact_dedup, LSH pairs, novelty, gopher,
  surprisal, ANN top-k, BM25 probe) on scaled in-memory frames;
* the registry HEAVYWEIGHTS (r5 task 6 / r6 task 4) — the suite's most
  expensive end-to-end queries (dd_dup_clusters, dd_star_clusters,
  dd_jaccard_prefix, tx_curate_pipeline, dd_lsh_eval, corpus_ingest,
  corpus_warc_ingest) — run through their real ``queries()`` callables
  against scaled sf-shaped directories, so fixture synthesis, lake
  commits and the WARC explode path are inside the measurement.

Usage: python tools/scale_probe.py [sf_dir] [out_md]
"""

from __future__ import annotations

import math
import shutil
import sys
import time

sys.path.insert(0, ".")

SCALES = (1, 4, 16)


def main() -> int:
    global SCALES
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "SCALE.md"
    if len(sys.argv) > 3:  # e.g. "1,16,64" for a deeper spot-check
        SCALES = tuple(int(x) for x in sys.argv[3].split(","))
    fixture = sys.argv[4] if len(sys.argv) > 4 else "legacy"
    assert fixture in ("legacy", "zipf"), fixture

    from pyspark.sql import functions as F

    from udata_datalake_service_spark.session import get_spark

    spark = get_spark()
    root = "/tmp/spark_hydra_scale_probe"
    shutil.rmtree(root, ignore_errors=True)

    if fixture == "zipf":
        # natural-statistics base corpus (VERDICT r12 task 4): round 12
        # proved the sf documents fixture's ~31-token vocabulary distorts
        # probe/prune behavior in both directions, so the dd/nb/sketch
        # alphas are re-fit on synthtext the way the BM25 probe leg was.
        # Same doc count as the legacy base; embeddings stay the sf table
        # (ANN probes scale the vector count, not the text).
        from udata_datalake_service_spark.llm.synthtext import zipf_documents

        zipf_documents(spark, 5000, seed="scale-zipf", num_partitions=32).write.mode(
            "overwrite"
        ).parquet(f"{root}/base_docs")
        docs = spark.read.parquet(f"{root}/base_docs")
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()
    n_emb = emb.count()
    for s in SCALES:
        parts = []
        eparts = []
        for i in range(s):
            # per-copy token mapping: append s<i> to every alphanumeric
            # run — intra-copy similarity structure preserved, cross-copy
            # shingle overlap zero, tokenizer-transparent (module doc)
            salted = F.regexp_replace(F.col("text"), r"([A-Za-z0-9]+)", f"$1s{i}")
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                    salted.alias("text"),
                    "lang",
                    "source",
                    # full sf-dir schema so registry callables run as-is
                    F.length(salted).cast("long").alias("n_chars"),
                )
            )
            eparts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * n_emb)).alias("vec_id"),
                    "label",
                    "embedding",
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        e = eparts[0]
        for p in eparts[1:]:
            e = e.unionByName(p)
        # sf-shaped layout: registry queries read {dir}/documents.parquet
        d.repartition(32).write.mode("overwrite").parquet(
            f"{root}/sf_{s}x/documents.parquet"
        )
        e.repartition(32).write.mode("overwrite").parquet(
            f"{root}/sf_{s}x/embeddings.parquet"
        )

    def quiesce():
        """Measurement hygiene between probes (r8 fix for the phantom
        corpus_ingest ×16 step): the pair-heavy probes (dd_jaccard_prefix,
        dd_lsh_eval) leave ~100 s worth of shuffle files and JVM garbage
        behind; whatever runs NEXT in the same session was being charged
        for it (corpus_ingest measured 27.9 s after them vs 7.0 s in a
        clean session — flat across scales). Dropping cached plans and
        forcing a JVM GC lets the ContextCleaner reclaim unreferenced
        shuffle/broadcast state before the next timer starts."""
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)

    def probe_ops(s: int) -> dict[str, float]:
        from udata_datalake_service_spark.caching import settle
        from udata_datalake_service_spark.llm.corpus import ngram_novelty
        from udata_datalake_service_spark.llm.dedup import (
            exact_dedup,
            lsh_candidate_pairs,
            minhash_signatures,
        )
        from udata_datalake_service_spark.llm.gopher import gopher_quality
        from udata_datalake_service_spark.llm.similarity import lsh_bucketed_topk
        from udata_datalake_service_spark.llm.tfidf import unigram_surprisal

        d = spark.read.parquet(f"{root}/sf_{s}x/documents.parquet")
        e = spark.read.parquet(f"{root}/sf_{s}x/embeddings.parquet")
        q = e.filter(F.col("vec_id") < 5)
        out: dict[str, float] = {}

        def run(name, thunk):
            quiesce()
            t0 = time.monotonic()
            thunk()
            out[name] = round(time.monotonic() - t0, 2)

        run("exact_dedup", lambda: exact_dedup(d).write.format("noop").mode("overwrite").save())
        run(
            "minhash_lsh_pairs",
            lambda: lsh_candidate_pairs(
                minhash_signatures(d, num_hashes=8, k=2), num_bands=4, rows_per_band=2
            ).write.format("noop").mode("overwrite").save(),
        )
        run(
            "ngram_novelty",
            lambda: settle(ngram_novelty(d, k=2)).write.format("noop").mode("overwrite").save(),
        )
        run("gopher_quality", lambda: gopher_quality(d).write.format("noop").mode("overwrite").save())
        run(
            "unigram_surprisal",
            lambda: settle(unigram_surprisal(d)).write.format("noop").mode("overwrite").save(),
        )
        run(
            "ann_lsh_topk",
            lambda: lsh_bucketed_topk(e, q, k=10).write.format("noop").mode("overwrite").save(),
        )
        # r11 retrieval plane: probes live in copy 0 (salt-disjoint vocab),
        # so the matched posting lists stay constant-size as the corpus
        # scales — the measured growth is the posting/stats build (corpus-
        # linear); probe-side cost must NOT grow with the corpus
        from udata_datalake_service_spark.llm.retrieval import bm25_topk

        probes = d.filter(F.col("doc_id") < 5).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        run(
            "bm25_topk",
            lambda: bm25_topk(d, probes, k=10).write.format("noop").mode("overwrite").save(),
        )
        return out

    HEAVY = (
        "dd_dup_clusters",
        "dd_star_clusters",
        "dd_jaccard_prefix",
        "tx_curate_pipeline",
        "dd_lsh_eval",
        "corpus_ingest",
        "corpus_warc_ingest",
        # r8 additions — not heavyweights, but their alphas document the
        # claimed shapes (vocab-bounded NB, codebook-bounded PQ ADC,
        # sketch-sized count-min shuffle)
        "tx_lang_id",
        "nb_source_classifier",
        "ann_pq_topk",
        "sk_countmin_hh",
    )

    def probe_registry(s: int) -> dict[str, float]:
        from udata_datalake_service_spark.entry_queries import QUERIES

        out: dict[str, float] = {}
        for name in HEAVY:
            quiesce()
            t0 = time.monotonic()
            QUERIES[name](spark, f"{root}/sf_{s}x").write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.monotonic() - t0, 2)
        return out

    # warm the session once so 1x isn't charged JVM/codegen startup
    probe_ops(1)
    results = {s: probe_ops(s) for s in SCALES}
    probe_registry(1)
    for s in SCALES:
        results[s].update(probe_registry(s))

    ops = list(results[SCALES[0]])
    with open(out_md, "w") as f:
        base_tag = "zipf synthtext" if fixture == "zipf" else sf_dir
        f.write(
            "# SCALE — measured operator scaling (`tools/scale_probe.py`, "
            f"base={base_tag}, {n_docs} docs ×{{{','.join(map(str, SCALES))}}})\n\n"
            "Fitted growth exponent alpha from t ∝ n^alpha over the full probed "
            "span, warm session, cache cleared + JVM GC quiesce per probe "
            "(r8: without the quiesce, shuffle debris from the ~100 s "
            "pair-heavy probes was billed to whatever ran next — "
            "corpus_ingest showed a phantom 27.9 s ×16 step that is 7.0 s "
            "flat in a clean session). Reading: alpha "
            "well below 1 means fixed per-job overhead (stage scheduling, "
            "codegen) still dominates at probe scale — the corpus-dependent "
            "cost is small, i.e. throughput headroom. The diagnostic value "
            "is the ABSENCE of super-linear growth: a hidden cartesian or "
            "quadratic candidate blow-up would push alpha toward 2 and be "
            "unmistakable by 16×. Pair-producing operators (LSH candidates) "
            "are expected highest — their OUTPUT grows faster than n. The "
            "second block is the registry heavyweights run end-to-end "
            "through their `queries()` callables (fixture synthesis, lake "
            "commits and WARC explode inside the measurement).\n\n"
            "| operator | " + " | ".join(f"t@{s}x s" for s in SCALES)
            + " | alpha |\n"
            "|---|" + "---|" * len(SCALES) + "---|\n"
        )
        for op in ops:
            t1, t4, t16 = (results[s][op] for s in SCALES)
            span = SCALES[-1] / SCALES[0]
            alpha = math.log(max(t16, 1e-3) / max(t1, 1e-3)) / math.log(span)
            f.write(f"| {op} | {t1} | {t4} | {t16} | {alpha:.2f} |\n")
    print(f"wrote {out_md}")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
