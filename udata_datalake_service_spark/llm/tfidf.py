"""Corpus statistics: document frequencies, vocabulary construction, and
TF-IDF term scoring — the classic lexical feature plane (search ranking,
keyword extraction, cheap topic signals for curation).

Shapes, all explode → partial-agg groupBy (map-side combine carries the
heavy lifting; the shuffle rows are (term) or (doc, term) pairs, never
text):

- ``document_frequencies``: distinct (doc, term) → groupBy(term).count().
- ``build_vocab``: top-``max_size`` terms by (df desc, term asc) with dense
  contiguous ids — deterministic (integer df + total string order), so ids
  are stable across engines and runs; at 100 TB this is a single top-k over
  the term aggregate, not a sort of the corpus.
- ``tfidf_top_terms``: per-doc top-k terms by rounded tf·idf. The rank key
  is round(score, 6) then term — rounding first makes the cross-engine
  ordering exact (raw doubles could differ in the last ulp between JVM and
  C libm).

IDF is the smooth variant ln((N+1)/(df+1)) + 1 (sklearn's default) — never
divides by zero, never negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from udata_datalake_service_spark.caching import adopt
from udata_datalake_service_spark.llm.text import tokens


def _doc_terms(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(id, term, tf) — per-document term counts from the token stream."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, df) — number of documents containing each term."""
    return (
        _doc_terms(df, text, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def build_vocab(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    max_size: int = 1000,
    min_df: int = 1,
) -> DataFrame:
    """(token_id, term, df): ids 1..max_size assigned by (df desc, term
    asc). The global window runs over at most ``max_size`` pre-limited
    rows — orderBy().limit() executes as TakeOrderedAndProject, so no full
    sort of the term space."""
    freqs = document_frequencies(df, text, id_col).filter(F.col("df") >= min_df)
    top = freqs.orderBy(F.desc("df"), F.asc("term")).limit(max_size)
    w = Window.partitionBy().orderBy(F.desc("df"), F.asc("term"))
    return top.withColumn("token_id", F.row_number().over(w).cast("long")).select(
        "token_id", "term", "df"
    )


def tfidf_top_terms(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per-doc top-k terms: (id, term, tf, score, rank). Joins the per-doc
    term counts with the term-frequency aggregate — the df side is small
    after aggregation (broadcast candidate; AQE picks it from runtime
    stats), then one window per doc for the top-k cut."""
    dt = _doc_terms(df, text, id_col)
    freqs = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    scored = (
        dt.join(freqs, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def vocab_coverage(
    df: DataFrame,
    vocab_sizes: tuple[int, ...] = (100, 1000, 10000),
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-budget curve: what fraction of all token OCCURRENCES the
    top-``k`` vocabulary covers, for each requested k — the number that
    decides a vocab size before training a tokenizer.

    Terms rank by (occurrence count desc, term asc) — integer counts plus
    a total string order make the curve deterministic and engine-exact.
    Shape: explode → groupBy(term) with map-side combine (the shuffle is
    one row per distinct term), then an ordered cumsum window over the
    TERM AGGREGATE only — the vocabulary (≪ corpus; low millions at
    100 TB) flows through a single ordered partition, never the corpus.

    Returns (vocab_size, n_terms, covered_occurrences, total_occurrences,
    coverage) — one row per requested size; n_terms < vocab_size when the
    corpus has fewer distinct terms.
    """
    tf = (
        df.select(F.explode(tokens(F.col(text))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    w = Window.orderBy(F.desc("occ"), F.asc("term"))
    ranked = tf.select(
        "occ",
        F.row_number().over(w).alias("rank"),
        F.sum("occ").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("occ").over(Window.partitionBy()).alias("total"),
    )
    ks = sorted(set(int(k) for k in vocab_sizes))
    aggs = []
    for k in ks:
        inside = F.col("rank") <= k
        aggs.extend(
            [
                F.count_if(inside).alias(f"n_{k}"),
                F.max(F.when(inside, F.col("cum"))).alias(f"cov_{k}"),
            ]
        )
    aggs.append(F.max("total").alias("total"))
    one = ranked.agg(*aggs)
    per_k = [
        F.struct(
            F.lit(k).alias("vocab_size"),
            F.col(f"n_{k}").alias("n_terms"),
            F.coalesce(F.col(f"cov_{k}"), F.lit(0)).alias("covered_occurrences"),
            F.col("total").alias("total_occurrences"),
        )
        for k in ks
    ]
    return (
        one.select(F.explode(F.array(*per_k)).alias("r"))
        .select("r.*")
        .withColumn(
            "coverage",
            F.round(F.col("covered_occurrences") / F.col("total_occurrences"), 6),
        )
    )


def hashed_features_sparse(
    df: DataFrame,
    n_buckets: int = 64,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature hashing (the hashing trick): term counts folded into a
    fixed ``n_buckets``-dim space with a second-hash sign to debias
    collisions (Weinberger et al., ICML'09) — the vocabulary-free
    featurizer for downstream linear models / sketches.

    Bucket and sign are md5-derived (engine-exact, no seed state):
    bucket = first 32 md5 bits mod n_buckets, sign = 9th hex digit's
    parity. Output is the SPARSE grain (id, bucket, value) — one row per
    touched bucket including signed-cancelled zeros, exactly replayable
    in SQL; ``hashed_features_dense`` assembles the array form.

    Shape: explode → groupBy(id, bucket) integer sum — map-side combined,
    the shuffle carries (id, bucket, count) longs only.
    """
    from udata_datalake_service_spark.functions.hashing import md5_32

    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text))).alias("t"))
    h = F.md5(F.col("t"))
    bucket = md5_32(F.col("t")) % n_buckets
    sgn = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        tok.select("id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("id", "bucket")
        .agg(F.sum("sgn").alias("value"))
        .select(F.col("id").alias(id_col), "bucket", "value")
    )


def hashed_features_dense(
    df: DataFrame,
    n_buckets: int = 64,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense array<long> assembly of ``hashed_features_sparse`` (map
    lookup over a bucket sequence — no extra shuffle past the sparse
    aggregate). Token-less documents yield the zero vector."""
    sparse = hashed_features_sparse(df, n_buckets, text=text, id_col=id_col)
    assembled = (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "value"))
            ).alias("m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda b: F.coalesce(F.element_at(F.col("m"), b.cast("long")), F.lit(0)),
            ).alias("features"),
        )
    )
    zero = F.array(*[F.lit(0).cast("long") for _ in range(n_buckets)])
    return (
        df.select(F.col(id_col))
        .distinct()
        .join(assembled, on=id_col, how="left")
        .select(id_col, F.coalesce("features", zero).alias("features"))
    )


def unigram_surprisal(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    quantum: int = 1_000_000,
) -> DataFrame:
    """Perplexity-proxy scoring with a self-trained unigram LM — the
    CCNet-style third leg of curation next to heuristic quality and dedup:
    documents whose tokens are improbable under the corpus's own unigram
    distribution (gibberish, wrong-language residue, encoding damage)
    score high; boilerplate scores low.

    Model: p(t) = count(t) / total over the SAME corpus (add-nothing —
    every scored token was counted, so p > 0 by construction). Score =
    mean negative log-likelihood per token. The per-token nll is rounded
    to 1/quantum and summed as exact integers (float addition is
    partial-aggregation-order dependent; the fixed-point sum makes the
    mean bit-identical across engines and partitionings — same device as
    the embedding centroids).

    Shape: ONE tokenize+explode pass collapsed map-side to the
    (doc, term) count grain and persisted — both the vocab-sized LM
    aggregate (which also yields the corpus total, Σocc) and the scoring
    join reuse it, so the corpus is tokenized exactly once. The LM join
    is broadcast-eligible (the vocab is tiny next to the corpus); one
    groupBy(doc) finishes. Returns (id_col, n_tokens, mean_nll) —
    mean_nll rounded to 6, NULL-free (token-less docs report 0.0).
    """
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text))).alias("t"))
    per_doc = tok.groupBy("id", "t").agg(F.count(F.lit(1)).alias("n")).persist()
    # vocabulary-bounded, never corpus-bounded
    freqs = per_doc.groupBy("t").agg(F.sum("n").alias("occ")).persist()
    total = int(freqs.agg(F.sum("occ")).collect()[0][0] or 0)
    nll_q = F.round(-F.log(F.col("occ") / F.lit(float(total))) * quantum, 0).cast("long")
    scored = (
        per_doc.join(freqs, on="t")
        .groupBy("id")
        .agg(F.sum("n").alias("n_tokens"), F.sum(F.col("n") * nll_q).alias("s"))
        .select(
            "id",
            "n_tokens",
            F.round(F.col("s") / (F.col("n_tokens") * F.lit(float(quantum))), 6).alias(
                "mean_nll"
            ),
        )
    )
    return adopt(
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .join(scored, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("mean_nll", F.lit(0.0)).alias("mean_nll"),
        ),
        per_doc,
        freqs,
    )


def dsir_log_weights(
    df: DataFrame,
    is_target,
    text: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    use_bigrams: bool = True,
    quantum: int = 1_000_000,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much more likely its hashed n-gram features are under the
    TARGET distribution than under the RAW distribution —
    ``log w(x) = Σ_feat [log p_target(bucket) − log p_raw(bucket)]`` —
    the weights Gumbel-top-k / weighted sampling then resamples by.

    Both bucket LMs are estimated from the input itself: rows where
    ``is_target`` holds define the target corpus, the rest the raw
    corpus. Features are unigrams (+ word bigrams, as in the paper)
    hashed with the same md5 bucket device as ``hashed_features_sparse``;
    probabilities are add-1 smoothed over ``n_buckets``.

    Engine-exactness: the per-bucket log-ratio is quantized once to
    1/quantum in the TINY bucket table (n_buckets rows) and per-doc sums
    run on exact integers — the same fixed-point device as
    `unigram_surprisal`, so the mean is partition-order independent and
    SQL-replayable bit-for-bit.

    Shape at 100 TB: ONE explode pass collapsed map-side to the
    (doc, bucket) grain (≤ docs × n_buckets rows, persisted — the
    tokenize+hash never re-executes), a bucket aggregate over that grain
    (n_buckets rows), and one broadcast join of the tiny log-ratio table
    back onto the same grain → groupBy(doc). The only driver-side data
    is the n_buckets-row count table.

    Returns (id_col, n_feats, log_weight) — log_weight rounded to 6,
    token-less documents report 0.0.
    """
    from udata_datalake_service_spark.llm.text import word_bigrams

    # stage the token array before deriving features from it: inline,
    # concat(toks, word_bigrams(toks)) re-runs the full-document tokenize
    # ~4× per row (word_bigrams references toks three times and lambdas
    # are outside codegen CSE — r13 opt, same device as llm/text.py)
    staged = df.select(
        F.col(id_col).alias("id"),
        is_target.alias("tgt"),
        tokens(F.col(text)).alias("__t"),
    )
    t = F.col("__t")
    feats = F.concat(t, word_bigrams(t)) if use_bigrams else t
    ex = staged.select("id", "tgt", F.explode(feats).alias("f"))
    from udata_datalake_service_spark.functions.hashing import md5_32

    ex = ex.select("id", "tgt", (md5_32(F.col("f")) % n_buckets).alias("bucket"))
    # The tokenize+md5 explode is the expensive pass, so it runs ONCE:
    # collapse to the (id, tgt, bucket) grain first (map-side combined;
    # bounded by docs × n_buckets rows — never the exploded corpus) and
    # persist THAT. Both the n_buckets-row LM table (collected — bounded
    # by n_buckets) and the per-doc scorer below reuse it; previously the
    # full explode re-executed for the scoring join.
    per_doc = (
        ex.groupBy("id", "tgt", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    bc_rows = (
        per_doc.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("tgt"), F.col("n")).otherwise(0)).alias("ct"),
            F.sum(F.when(~F.col("tgt"), F.col("n")).otherwise(0)).alias("cr"),
        )
        .collect()
    )
    nt = sum(int(r["ct"]) for r in bc_rows)
    nr = sum(int(r["cr"]) for r in bc_rows)
    bc = df.sparkSession.createDataFrame(
        [(int(r["bucket"]), int(r["ct"]), int(r["cr"])) for r in bc_rows],
        "bucket long, ct long, cr long",
    )
    lr = bc.select(
        "bucket",
        F.round(
            (
                F.log((F.col("ct") + 1) / F.lit(float(nt + n_buckets)))
                - F.log((F.col("cr") + 1) / F.lit(float(nr + n_buckets)))
            )
            * quantum,
            0,
        )
        .cast("long")
        .alias("lrq"),
    )
    scored = (
        per_doc.join(F.broadcast(lr), on="bucket")
        .groupBy("id")
        .agg(F.sum("n").alias("n_feats"), F.sum(F.col("n") * F.col("lrq")).alias("s"))
        .select(
            "id",
            "n_feats",
            F.round(F.col("s") / F.lit(float(quantum)), 6).alias("log_weight"),
        )
    )
    return adopt(
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .join(scored, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        ),
        per_doc,
    )


def bigram_surprisal(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    quantum: int = 1_000_000,
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram-LM surprisal — the stronger perplexity proxy
    next to `unigram_surprisal` (CCNet scores with a 5-gram KenLM; a
    Jelinek-Mercer-interpolated bigram LM is the distributed-aggregate
    form of the same signal, one corpus pass instead of a model file):

        p(w_i | w_{i-1}) = λ · c(w_{i-1} w_i)/c(w_{i-1}) + (1−λ) · c(w_i)/N

    with the first token scored by its unigram term alone. λ=0.75 is
    exactly binary-representable, so both engines compute identical
    doubles before the fixed-point quantization (the per-EVENT nll is
    rounded to 1/quantum and summed as exact integers — the same
    partition-order-independence device as `unigram_surprisal`).

    Shape at 100 TB (r14 opt): ONE tokenize feeds BOTH grains — the
    persisted (doc, bigram) grain and a tiny persisted per-doc header
    (n_tokens, first token, LAST token). Unigram counts never re-tokenize
    and never shuffle raw positions: every token occurrence is the FIRST
    word of exactly one bigram occurrence except each document's last
    token, so ``c(w) = Σ_bg first-word occurrences + #{docs whose last
    token is w}`` — both legs are derived from the two cached grains
    (exact integer identity; the prior shape re-tokenized the corpus for
    the unigram counts AND for the first-token/n_tokens legs, up to 4
    tokenize passes per run). The LM tables are vocabulary-bounded; the
    LM joins hit the (doc, bigram) grain, never raw positions; one
    groupBy(doc) finishes. Returns (id_col, n_tokens, mean_nll) with
    mean over ALL tokens (first-token unigram event included), rounded
    to 6.
    """
    toks = tokens(F.col(text))
    from udata_datalake_service_spark.llm.text import word_bigrams

    # ONE persisted tokenize pass: header scalars + the bigram array ride
    # the same cache, so the grain explode, the unigram legs and the
    # final n_tokens/t1 joins all read the cache — the corpus text is
    # split exactly once per run (the bg-array cache is released at
    # settle; MEMORY_AND_DISK spills at scale, which is still cheaper
    # than a second full regex tokenize of the corpus)
    base = (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("t"),
        )
        .select(
            "id",
            F.size("t").alias("n_tokens"),
            F.when(F.size("t") >= 1, F.element_at("t", 1)).alias("t1"),
            F.when(F.size("t") >= 1, F.element_at("t", -1)).alias("tl"),
            word_bigrams(F.col("t")).alias("bg"),
        )
        .persist()
    )
    # per-doc header — 4 scalars/doc, column-pruned off the cache
    header = base.select("id", "n_tokens", "t1", "tl")
    # (doc, bigram) grain — persisted (two aggregate consumers)
    per_doc_bg = (
        base.select("id", F.explode("bg").alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    # LM tables: bigram counts, first-word counts, unigram counts + total
    bg_counts = per_doc_bg.groupBy("bg").agg(F.sum("n").alias("cbg"))
    prev_counts = (
        bg_counts.select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("tk"),
            "cbg",
        )
        .groupBy("tk")
        .agg(F.sum("cbg").alias("cprev"))
    )
    # unigram counts from the grains alone (no second tokenize): first-word
    # occurrences (≡ prev_counts) ⊕ one occurrence per doc's last token.
    # Exact: for tokens w1..wn the bigram first words are w1..w(n-1) and
    # the header contributes wn — n occurrences total, identical integers
    # to counting the exploded token stream. tokens() yields space-free
    # strings (split on TOKEN_SPLIT_RE), so the split_part round-trip is
    # lossless — the same invariant prev_counts/lm already rely on.
    # not persisted: both consumers (lm, first_nll) reference the
    # canonically identical subtree off the two caches, so AQE exchange
    # reuse materializes it once (the r13 retrieval-plane lesson —
    # a persist here only adds a cache-fill barrier)
    uni = (
        prev_counts.select("tk", F.col("cprev").alias("n"))
        .union(
            header.filter(F.col("tl").isNotNull())
            .groupBy(F.col("tl").alias("tk"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        .groupBy("tk")
        .agg(F.sum("n").alias("cu"))
    )
    # Σ cu ≡ Σ n_tokens — read it from the tiny header cache
    total = int(header.agg(F.sum("n_tokens")).collect()[0][0] or 0)
    # per-bigram interpolated nll, quantized once at the TYPE grain
    lm = (
        bg_counts.select("bg", "cbg", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("pk"),
                         F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("ck"))
        .join(prev_counts.select(F.col("tk").alias("pk"), "cprev"), on="pk")
        .join(uni.select(F.col("tk").alias("ck"), F.col("cu").alias("cu_cur")), on="ck")
        .select(
            "bg",
            F.round(
                -F.log(
                    F.lit(float(lam)) * (F.col("cbg") / F.col("cprev"))
                    + F.lit(1.0 - float(lam)) * (F.col("cu_cur") / F.lit(float(total)))
                )
                * quantum,
                0,
            )
            .cast("long")
            .alias("nllq"),
        )
    )
    scored_bg = (
        per_doc_bg.join(lm, on="bg")
        .groupBy("id")
        .agg(F.sum(F.col("n") * F.col("nllq")).alias("s_bg"))
    )
    # first-token unigram event
    first_nll = (
        header.filter(F.col("t1").isNotNull())
        .join(uni.select(F.col("tk").alias("t1"), "cu"), on="t1")
        .select(
            "id",
            F.round(-F.log(F.col("cu") / F.lit(float(total))) * quantum, 0)
            .cast("long")
            .alias("s_first"),
        )
    )
    out = (
        header.select("id", "n_tokens")
        .join(scored_bg, on="id", how="left")
        .join(first_nll, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    (F.coalesce("s_bg", F.lit(0)) + F.coalesce("s_first", F.lit(0)))
                    / (F.col("n_tokens") * F.lit(float(quantum))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_nll"),
        )
    )
    return adopt(out, per_doc_bg, base)
