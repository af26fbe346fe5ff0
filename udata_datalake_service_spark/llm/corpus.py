"""Corpus-level training-data diagnostics: novelty, paragraph dedup,
padding waste.

Three operators a 100 TB pretraining pipeline runs between raw crawl and
tokenizer:

* :func:`ngram_novelty` — per-document marginal novelty under stream
  order (how many of a doc's n-grams appear here FIRST): the data-value
  curve that decides whether another shard of a source is still worth
  ingesting (diminishing-returns diagnostic; cf. the dedup→scaling-law
  analyses in Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better").
* :func:`paragraph_dedup` — C4-style repeated-paragraph removal
  (Raffel et al. 2020 drop repeated three-sentence spans; here the unit
  is a caller-defined paragraph split) with TEXT RECONSTRUCTION: every
  occurrence after the global first is dropped and the surviving
  paragraphs are reassembled in order.
* :func:`padding_waste_report` — padding overhead of length-bucketed
  batching vs arrival-order batching: the fraction of compute a trainer
  burns on pad tokens for a given batch size, before/after sorting by
  length (the case for the `llm/packing.py` operators, quantified).

Scale shapes: novelty and paragraph dedup are each ONE shuffle on the
(8-byte hashed) unit key to find the global first occurrence + one
shuffle back on doc id; the waste report is two window passes over
(id, len) pairs only. No text ever shuffles except the paragraph
reassembly's surviving spans.

Reference parity note: the reference service has no corpus plane — these
are beyond-reference operators in the spirit of its analysis endpoints
(udata_hydra/analysis/csv.py profiles per-resource; these profile
per-corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from udata_datalake_service_spark.caching import adopt
from udata_datalake_service_spark.llm.text import tokens


def ngram_novelty(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
) -> DataFrame:
    """Per-document first-occurrence novelty under ascending ``id_col``
    stream order.

    A k-gram is OWNED by the smallest doc id that contains it; a doc's
    novelty is the fraction of its distinct k-grams it owns. Early docs
    score near 1, late near-duplicates near 0 — sorting sources by
    aggregate novelty ranks their marginal value.

    Returns (id_col, n_grams, n_novel, novelty) with novelty rounded
    to 6. Docs shorter than k tokens report 0 grams and novelty 0.0.

    Shape: ONE explode(distinct grams) pass hashed to xxhash64 (persisted
    — it feeds both aggregates) → per-doc gram counts, and min(doc) per
    gram (map-side combined, one shuffle on the 8-byte gram key) whose
    OWNER column regrouped is already the per-doc novel count — no
    corpus-sized join back to the exploded grams. The only joins are the
    two vocabulary/doc-sized left joins onto the id spine.
    """
    # tokens land in a real column first: an inline tokens() subtree
    # referenced inside the transform lambda is re-split PER WINDOW on
    # the interpreted higher-order path (llm/dedup.shingles_of_tokens)
    toks = F.col("__t")
    # guard: F.sequence(0, n) DESCENDS for n < 0, so short docs need an
    # explicit empty-gram branch. The gram strings hash AFTER the explode:
    # xxhash64 inside the transform lambda runs on the interpreted
    # higher-order-function path (~5× slower, measured 4.6 s vs 0.9 s at
    # sf0.1); post-explode it's whole-stage codegen.
    grams = F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
            )
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    ex = (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text)).alias("__t"))
        .select("id", F.explode(grams).alias("g"))
        .select("id", F.xxhash64("g").alias("g"))
        .persist()
    )
    counts = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    # min(id) per gram IS the ownership assignment; regrouping the owner
    # column yields each doc's novel-gram count without ever joining back
    # to the exploded corpus
    novel = (
        ex.groupBy("g")
        .agg(F.min("id").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return adopt(
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .join(counts, on="id", how="left")
        .join(novel, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_novel", F.lit(0)) / F.col("n_grams"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("novelty"),
        ),
        ex,
    )


def paragraph_dedup(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    para_tokens: int = 10,
    split_regex: str | None = None,
) -> DataFrame:
    """C4-style global paragraph dedup with reconstruction.

    Paragraph unit: ``split_regex`` when given (e.g. ``"\\n\\n+"`` for
    real prose); otherwise fixed ``para_tokens``-token runs — the
    fallback for corpora without structural newlines (the synthetic
    fixture corpus). Every paragraph occurrence AFTER the global first —
    first = smallest (doc id, paragraph index) — is dropped; survivors
    reassemble in index order.

    Returns (id_col, n_paras, n_kept, clean_text).

    Shape: paragraphs explode with their index, the global-first winner
    per paragraph is one min(struct(doc, idx)) aggregate on the hashed
    paragraph key, survivors rejoin and re-concat per doc. Only
    SURVIVING paragraph text shuffles to the reassembly; the ownership
    aggregate moves hashes.
    """
    # regex mode reassembles with a blank line so paragraph BOUNDARIES
    # survive (a space-joined output could never be paragraph-deduped
    # again); token mode joins with the space the chunks were cut on
    join_sep = "\n\n" if split_regex is not None else " "
    if split_regex is not None:
        # trim each paragraph BEFORE hashing: ' gamma delta' and
        # 'gamma delta' are the same boilerplate, and the emptiness
        # filter already treats them alike
        paras = F.filter(
            F.transform(F.split(F.col(text), split_regex), lambda p: F.trim(p)),
            lambda p: F.length(p) > 0,
        )
    else:
        # attribute reference, not an inline tokens() subtree: the
        # lambda would re-split the whole doc per chunk otherwise
        # (llm/dedup.shingles_of_tokens)
        toks = F.col("__t")
        n_chunks = F.ceil(F.size(toks) / F.lit(para_tokens)).cast("int")
        # guard: F.sequence(0, n-1) DESCENDS for n = 0, fabricating two
        # bogus empty paragraphs on token-less docs (caught by the
        # hypothesis reference-replay property)
        paras = F.when(
            n_chunks >= 1,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * para_tokens + 1, para_tokens)
                ),
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))
    pre = (
        df.select(
            F.col(id_col).alias("id"), F.col(text), tokens(F.col(text)).alias("__t")
        )
        if split_regex is None
        else df.select(F.col(id_col).alias("id"), F.col(text))
    )
    ex = pre.select(
        "id", F.posexplode(paras).alias("pidx", "ptext")
    ).withColumn("ph", F.xxhash64("ptext"))
    first = ex.groupBy("ph").agg(
        F.min(F.struct("id", "pidx")).alias("f")
    ).select("ph", F.col("f.id").alias("fid"), F.col("f.pidx").alias("fpidx"))
    kept = ex.join(first, on="ph").filter(
        (F.col("id") == F.col("fid")) & (F.col("pidx") == F.col("fpidx"))
    )
    rebuilt = (
        kept.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pidx", "ptext"))),
                    lambda s: s["ptext"],
                ),
                join_sep,
            ).alias("clean_text"),
        )
    )
    totals = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_paras"))
    return (
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .join(totals, on="id", how="left")
        .join(rebuilt, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def padding_waste_report(
    df: DataFrame,
    len_col: str,
    id_col: str = "doc_id",
    batch_size: int = 32,
) -> DataFrame:
    """Padding overhead of batch-of-``batch_size`` training, arrival
    order vs length-sorted order.

    Every batch pads its members to the batch max; waste = padded −
    real tokens. Arrival order batches by ascending ``id_col`` (the
    stream a loader would see); sorted order batches by (length, id) —
    the length-bucketed loader the packing operators feed. One row per
    strategy: n_batches, real_tokens, padded_tokens, waste_ratio.

    Shape: two window passes over (id, len) pairs — the text itself
    never moves. The global row_number window is the honest cost: at
    100 TB you'd compute batch ids per shard (the report is per-shard
    there anyway); the ratio aggregates are map-side combined.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(len_col).cast("long").alias("ln")
    )

    def leg(order_cols, label):
        w = Window.orderBy(*order_cols)
        b = base.withColumn(
            "batch", ((F.row_number().over(w) - 1) / batch_size).cast("long")
        )
        per_batch = b.groupBy("batch").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ln").alias("real"),
            (F.max("ln") * F.count(F.lit(1))).alias("padded"),
        )
        return per_batch.agg(
            F.lit(label).alias("strategy"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.coalesce(F.sum("real"), F.lit(0)).cast("long").alias("real_tokens"),
            F.coalesce(F.sum("padded"), F.lit(0)).cast("long").alias("padded_tokens"),
            # empty input (or all-NULL lengths): 0.0, not NULL — the same
            # empty-denominator guard every sibling operator carries
            F.when(
                F.coalesce(F.sum("padded"), F.lit(0)) > 0,
                F.round(
                    (F.sum("padded") - F.sum("real")) / F.sum("padded"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("waste_ratio"),
        )

    arrival = leg([F.asc("id")], "arrival")
    by_len = leg([F.asc("ln"), F.asc("id")], "length_sorted")
    return arrival.unionByName(by_len)
