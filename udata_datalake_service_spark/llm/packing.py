"""Sequence packing — assigning documents to fixed token-budget training
chunks. Two industry-standard strategies, both deterministic:

- ``pack_stream``: the GPT-style concatenate-and-split layout. Documents
  are laid out in a fixed order on a per-bucket token stream; chunk k owns
  stream positions [k·budget, (k+1)·budget). A document knows its first and
  last chunk and its offset — exactly what a pretraining loader needs, and
  exactly replayable as window cumsums in ANSI SQL (the oracle).

- ``pack_greedy``: first-fit-decreasing bin packing per bucket — no
  document straddles a chunk boundary (SFT-style packing, where examples
  must stay whole). Sequential by nature, so it runs inside
  ``applyInPandas`` per bucket; invariants (no overflow except oversize
  singletons, every doc packed exactly once, determinism) are pytest-pinned.

Scale: both shapes shard the corpus into ``n_buckets`` independent streams
(bucket = doc_id % n_buckets — deterministic, no hash-collision ambiguity
across engines). At 100 TB you raise n_buckets until a bucket's documents
fit one task (the window sorts per bucket; greedy holds one bucket's
(id, tokens) pairs in memory — pairs, not text). Chunk ids are globally
unique as (bucket, chunk).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_stream(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 8,
) -> DataFrame:
    """Concatenated-stream chunk layout. Adds:

    bucket, cum_before (tokens laid out before this doc in its bucket),
    chunk_first / chunk_last (budget-sized chunks this doc touches),
    n_chunks, offset_in_chunk (position of the doc's first token).

    Documents must have ``token_col`` >= 1 (a zero-token doc occupies no
    stream positions; filter those upstream — asserted here via the
    chunk_last >= chunk_first invariant only when tokens >= 1).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    bucket = (F.col(id_col) % F.lit(n_buckets)).cast("long")
    out = df.withColumn("bucket", bucket)
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL token counts would silently emit NULL chunk bounds here (and
    # crash pack_greedy's kernel) — fail loudly at the first NULL instead
    out = out.withColumn(
        "__nn",
        F.assert_true(
            F.col(token_col).isNotNull(), f"NULL {token_col} in pack_stream"
        ),
    ).drop("__nn")
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    out = out.withColumn("cum_before", cum_before)
    b = int(budget)
    # integer DIV, not floating floor(x/y): cum_before can exceed 2^53 on a
    # real corpus and double arithmetic would mis-bin the tail
    return (
        out.withColumn("chunk_first", F.expr(f"cum_before DIV {b}"))
        .withColumn(
            "chunk_last",
            # backticks: a token column named with a space/hyphen must not
            # break the one SQL-string expression in this module
            F.expr(f"(cum_before + CAST(`{token_col}` AS BIGINT) - 1) DIV {b}"),
        )
        .withColumn("n_chunks", F.col("chunk_last") - F.col("chunk_first") + 1)
        .withColumn("offset_in_chunk", F.col("cum_before") % F.lit(b))
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 8,
) -> DataFrame:
    """First-fit-decreasing packing per bucket: docs sorted by (tokens desc,
    id asc) drop into the first open pack with room; docs larger than the
    budget get a singleton pack. Returns (id, tokens, bucket, pack_id,
    pack_id unique within bucket).

    applyInPandas carries only (id, tokens) per bucket — the text never
    ships. FFD is the standard 11/9·OPT approximation; determinism comes
    from the total sort order.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    bucket = (F.col(id_col) % F.lit(n_buckets)).cast("long")
    slim = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("tokens"),
        bucket.alias("bucket"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["tokens"].isna().any():
            # Arrow converts a nullable long column to float64 NaN; NaN
            # fails every fit test and int(NaN) raises mid-pack — fail
            # with a nameable error instead
            raise ValueError(f"NULL {token_col} in pack_greedy")
        pdf = pdf.sort_values(
            ["tokens", "id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        # first-fit scan vectorized with numpy: identical placement to the
        # Python loop (argmax returns the FIRST open pack with room), but
        # the per-doc scan runs in C — the pure-Python form was
        # O(docs × packs) interpreter work and became the straggler on
        # million-doc buckets
        import numpy as np

        remaining = np.empty(len(pdf), dtype=np.int64)
        n_packs = 0
        assignment = []
        for t in pdf["tokens"].to_numpy():
            if n_packs:
                fits = remaining[:n_packs] >= t
                idx = int(np.argmax(fits))
                if fits[idx]:
                    remaining[idx] -= t
                    assignment.append(idx)
                    continue
            remaining[n_packs] = budget - t
            assignment.append(n_packs)
            n_packs += 1
        pdf["pack_id"] = assignment
        return pdf

    return slim.groupBy("bucket").applyInPandas(
        _pack, "id long, tokens long, bucket long, pack_id long"
    )

def chunk_documents(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping fixed-size token chunks — the
    context-window preprocessing step for training / RAG indexing.

    Chunk starts walk the token stream at ``stride = size − overlap``:
    positions 1, 1+stride, 2·stride+1, … while they still index a token;
    each chunk takes ``size`` tokens (the last one may be shorter). A
    trailing start whose tokens are entirely covered by the previous chunk
    is suppressed (start > n − overlap test is NOT used — the rule is
    start == 1 or the chunk extends past the previous one, i.e. it
    contributes ≥1 new token: start + size − stride… simplified to
    dropping starts where the previous chunk already reached the end).
    Token-less documents emit zero chunks (documented; count them with
    ``token_count`` upstream).

    Pure expressions (sequence → transform → posexplode): chunking is a
    map-only operator — NO shuffle at any scale; output order inside a doc
    is chunk_idx. Deterministic and exactly SQL-replayable (the oracle
    re-derives every chunk with range + array slicing).

    Returns (id_col, chunk_idx, start_token, n_chunk_tokens, chunk_text,
    chunk_id) where chunk_text is the normalized (lowercased, tokenized)
    span joined with single spaces and chunk_id = md5(doc_id|idx|text).
    """
    if not (0 <= overlap < size):
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap
    from udata_datalake_service_spark.llm.text import tokens

    toks = tokens(F.col(text))
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("t"), F.size(toks).alias("n")
    ).filter(F.col("n") > 0)
    # starts: 1, 1+stride, ... ≤ n; a start past the previous chunk's end
    # never happens (stride < size), and the first start always exists
    starts = F.sequence(F.lit(1), F.col("n"), F.lit(stride))
    # suppress a final fully-redundant start: start > 1 AND previous chunk
    # already covered [start, n] (prev_end = start - stride + size - 1 >= n)
    starts = F.filter(
        starts,
        lambda s: (s == 1) | (s - stride + size - 1 < F.col("n")),
    )
    chunks = base.select(
        "id",
        "n",
        F.posexplode(
            F.transform(starts, lambda s: F.struct(s.alias("s"), F.slice("t", s, size).alias("ct")))
        ).alias("idx", "c"),
    )
    return chunks.select(
        F.col("id").alias(id_col),
        F.col("idx").alias("chunk_idx"),
        F.col("c.s").alias("start_token"),
        F.size("c.ct").alias("n_chunk_tokens"),
        F.array_join("c.ct", " ").alias("chunk_text"),
        F.md5(
            F.concat_ws("|", F.col("id"), F.col("idx"), F.array_join("c.ct", " "))
        ).alias("chunk_id"),
    )
