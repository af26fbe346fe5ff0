"""Benchmark-contamination detection — the training-data hygiene pass that
flags corpus documents sharing verbatim n-grams with an evaluation set
(the standard decontamination method: GPT-3's 13-gram overlap filter,
PaLM/Llama variants with k in 8-13; k is a parameter here).

Shape: eval sets are tiny (thousands of docs) next to a 100 TB corpus, so
the benchmark side's distinct n-grams are BROADCAST; the corpus side is a
map-side explode → broadcast-hash-join → partial-agg groupBy on doc_id.
No shuffle of the corpus text, no inverted-index self-join — contamination
against a fixed eval set is strictly cheaper than corpus-level dedup.

The n-gram identity is the exact space-joined token window (not a hash),
so the operator is replayable in ANSI SQL and collision-free; a production
deployment can swap in xxhash64(ngram) to shrink the broadcast without
changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udata_datalake_service_spark.llm.dedup import shingles_of_tokens
from udata_datalake_service_spark.planshape import pinned_filter


def _exploded_ngrams(
    df: DataFrame, text: str, id_col: str, k: int, toks_col: str | None = None
) -> DataFrame:
    """(id, ngram) pairs, distinct per document, only from docs with >= k
    tokens (shorter docs have no k-gram — the shingle whole-doc fallback
    is for dedup, not contamination, and is excluded here).

    Tokens are projected to a real column before the shingle transform —
    see shingles_of_tokens for the per-element re-evaluation hazard — and
    the length gate is a `pinned_filter`: pushed below the staging
    projection it would re-tokenize every document inside the predicate
    (r13 opt). ``toks_col`` reuses an already-staged token-array column
    instead of re-deriving it from ``text``."""
    from udata_datalake_service_spark.llm.text import tokens

    staged = (
        df.select(F.col(id_col), F.col(toks_col).alias("__t"))
        if toks_col is not None
        else df.select(F.col(id_col), tokens(F.col(text)).alias("__t"))
    )
    return pinned_filter(staged, F.size("__t") >= k).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles_of_tokens(F.col("__t"), k))
        ).alias("ngram"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per contaminated corpus doc: how many distinct k-grams it shares
    with the eval set (``n_shared_ngrams``) and how many distinct benchmark
    docs those hit (``n_bench_docs``). Clean docs are absent (inner join) —
    the caller anti-joins to drop contaminated docs or joins to quarantine.
    """
    c = _exploded_ngrams(corpus, text, id_col, k).withColumnRenamed(id_col, "cid")
    b = (
        _exploded_ngrams(benchmark, text, id_col, k)
        .withColumnRenamed(id_col, "bid")
    )
    hits = c.join(F.broadcast(b), "ngram")
    return hits.groupBy(F.col("cid").alias(id_col)).agg(
        F.count_distinct("ngram").alias("n_shared_ngrams"),
        F.count_distinct("bid").alias("n_bench_docs"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_shared: int = 0,
) -> DataFrame:
    """Corpus minus contaminated docs (> ``max_shared`` shared k-grams) —
    a broadcast left-anti join against the report's flagged ids."""
    flagged = (
        contamination_report(corpus, benchmark, text, id_col, k)
        .filter(F.col("n_shared_ngrams") > max_shared)
        .select(id_col)
    )
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
