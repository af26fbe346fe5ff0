"""Lexical + hybrid retrieval: distributed BM25 and reciprocal-rank fusion.

The curation loop needs retrieval as a first-class operator: targeted
decontamination ("find every training doc that *retrieves* for an eval
question"), dedup triage ("what else looks like this doc"), and topical
sampling all reduce to "score the corpus against a small query set".
Two planes compose here:

- **BM25** (Robertson et al.; the Lucene ``k1``/``b`` variant with the
  always-positive idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``) over the
  token stream — the lexical leg.
- **Reciprocal-rank fusion** (Cormack et al. 2009): ``Σ 1/(C + rank)``
  over any set of per-query rankings — the standard way to combine the
  lexical leg with an embedding-cosine leg without score calibration.

100 TB shapes:

- ``bm25_index`` is explode → partial-agg groupBy at (doc, term) grain,
  one term-grain shuffle to attach df, and two scalar aggregates
  (N, avgdl) broadcast via crossJoin — the same skeleton as
  ``llm/tfidf.py``. The output is a posting table keyed by term: write
  it to the lake once, query it many times (the deployment shape; a
  re-score never re-tokenizes the corpus).
- ``bm25_topk`` broadcasts the *query* term table (queries are small by
  contract — an eval set, not a corpus) against the posting table, so
  the corpus-sized side never reshuffles: one partial-agg sum per
  (query, doc) and a WindowGroupLimit top-k.
- ``rrf_fuse`` operates on already-top-m legs (k·|queries| rows each);
  cost is a union + one tiny groupBy.

Engine-exactness: per-term BM25 contributions are fixed-pointed to
integer micro-units *before* the per-document sum (the ``tx_surprisal``
pattern — integer sums are order-independent, so the cross-engine hash
cannot drift with aggregation order), and RRF's ``1/(C + rank)`` is an
exact IEEE division of integers, fixed-pointed the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from udata_datalake_service_spark.llm.text import tokens

FP = 1_000_000  # fixed-point micro-units for order-independent sums


def _doc_terms(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(id, term, tf, dl): per-document term counts + document length."""
    toks = df.select(F.col(id_col), tokens(F.col(text)).alias("__t"))
    return (
        toks.select(F.col(id_col), F.size("__t").alias("dl"), F.explode("__t").alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_index(
    corpus: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Posting table (term, id, w_fp): per-(term, doc) BM25 weight in
    integer micro-units.

    ``w = idf(term) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`` with
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` — never negative, never
    a division by zero. The weight is materializable: at deployment this
    table is written to the lake partitioned/bucketed by term, and every
    later query is a broadcast probe against it.
    """
    dt = _doc_terms(corpus, text, id_col)
    df_tbl = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # stats over the WHOLE corpus (zero-token docs count toward N/avgdl)
    stats = corpus.select(
        F.col(id_col), F.size(tokens(F.col(text))).alias("__dl")
    ).agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.sum("__dl").alias("total_dl"),
    )
    # expression order mirrored verbatim in the SQL oracles — identical
    # IEEE op order keeps the doubles bit-identical across engines
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfnorm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    return (
        dt.join(df_tbl, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.col(id_col),
            F.round(idf * tfnorm * FP, 0).cast("long").alias("w_fp"),
        )
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
    index: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` corpus documents per query by BM25.

    ``queries`` is (query_id, text) and SMALL by contract (it is
    broadcast — an eval set or probe batch, never a second corpus).
    Query terms count once each (distinct — the Lucene convention).
    Pass ``index=`` to reuse a precomputed/lake-loaded ``bm25_index``
    result instead of re-deriving it. ``exclude_self`` drops
    ``doc_id == query_id`` matches when both sides share an id space.

    Result: (query_id, doc_id, score, rnk) with ``score`` in points
    (rounded to 6), rank ties broken by doc id. The top-k window
    compiles to WindowGroupLimit (rank pushed into the shuffle).
    """
    idx = index if index is not None else bm25_index(corpus, text, id_col, k1, b)
    q_terms = F.broadcast(
        queries.select(
            F.col(query_id), F.explode(F.array_distinct(tokens(F.col(text)))).alias("term")
        )
    )
    scored = (
        idx.join(q_terms, "term")
        .groupBy(query_id, id_col)
        .agg(F.sum("w_fp").alias("__s"))
        .withColumn("score", F.round(F.col("__s") / F.lit(float(FP)), 6))
    )
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col(id_col))
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(query_id, id_col, "score", "rnk")
    )


def rrf_fuse(
    legs: dict[str, DataFrame],
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of per-query rankings.

    ``legs`` maps a leg name to a (query, id, rank) frame (each already
    top-m per query, so all inputs are k·|queries|-bounded). Fused score
    ``Σ 1/(c + rank)``; a document absent from a leg simply contributes
    nothing (the Cormack et al. convention). Output carries each leg's
    rank as ``<name>_rnk`` (null when absent) so the fusion is auditable.

    Result: (query_id, doc_id, <leg>_rnk..., rrf, rnk) — top-``k`` per
    query by (rrf desc, doc_id asc). ``1e6/(c+rank)`` is an exact IEEE
    division of integers, so the fixed-point sum is engine-exact.
    """
    names = list(legs)
    parts = []
    for name in names:
        d = legs[name]
        row = d.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.col(rank_col).cast("long").alias("__r"),
        )
        parts.append(
            row.select(
                "query_id",
                "doc_id",
                F.round(F.lit(float(FP)) / (F.lit(c) + F.col("__r")), 0)
                .cast("long")
                .alias("__fp"),
                *[
                    (F.col("__r") if n == name else F.lit(None).cast("long")).alias(
                        f"{n}_rnk"
                    )
                    for n in names
                ],
            )
        )
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    fused = allrows.groupBy("query_id", "doc_id").agg(
        F.sum("__fp").alias("__s"),
        *[F.max(f"{n}_rnk").alias(f"{n}_rnk") for n in names],
    )
    fused = fused.withColumn("rrf", F.round(F.col("__s") / F.lit(float(FP)), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", *[f"{n}_rnk" for n in names], "rrf", "rnk")
    )
