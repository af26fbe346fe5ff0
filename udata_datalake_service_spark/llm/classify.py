"""Multinomial Naive Bayes text classification, Spark-first.

The quality / language classifier slot of a training-data pipeline (CCNet's
fastText language filter, DCLM/phi-style quality classifiers): train a
bag-of-words model on labeled documents, score candidates, keep or
route by predicted class. fastText itself is out of scope (no model
binaries in this container, and its product is exactly a linear
bag-of-n-grams scorer) — multinomial NB is the same shape of linear
scorer with a closed-form, fully distributed fit, which makes BOTH the
training aggregate and the scoring join expressible as DataFrame ops
and exactly replayable by a SQL oracle.

Model (add-alpha smoothing over the TRAIN vocabulary):

    llh(l, t)  = ln( (count(l, t) + alpha) / (total(l) + alpha * V) )
    prior(l)   = ln( n_docs(l) / n_docs )
    score(d,l) = prior(l) + sum_t n(d, t) * llh(l, t)
    pred(d)    = argmax_l score(d, l), ties broken by label asc

Tokens outside the train vocabulary are ignored at scoring time (the
standard multinomial-NB treatment); a document with NO in-vocabulary
token is unclassifiable and absent from the prediction output.

Engine-exact determinism: every log is quantized to ``1/quantum`` and
summed as exact integers — float addition is partial-aggregation-order
dependent, integer sums are not — so scores, argmaxes and margins are
bit-identical across engines and partitionings (the fixed-point device
of `tfidf.unigram_surprisal` / `similarity.label_centroids`).

Scale shape: training is one tokenize+count pass collapsed map-side to
the (label, token) grain — vocabulary-bounded, never corpus-bounded.
The dense model is |labels| x |vocab| rows (a few dozen labels at most:
at 100 TB that is still a broadcast-sized table). Scoring re-uses the
corpus's (doc, token) count grain, joins the broadcast model, and
finishes with one groupBy(doc, label) and a per-doc argmax window —
one shuffle on the doc key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from udata_datalake_service_spark.llm.text import tokens


def nb_train(
    train: DataFrame,
    label: str = "lang",
    text: str = "text",
    alpha: int = 1,
    quantum: int = 1_000_000,
    max_vocab: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit the model. Returns (model, priors):

    * model:  (l, t, llh_q) — DENSE over labels x train-vocabulary, so a
      token seen only in other classes still contributes its smoothed
      floor (the left join + coalesce(0) below);
    * priors: (l, prior_q).

    ``max_vocab`` caps the vocabulary to the top-N tokens by corpus
    count (ties by token asc — deterministic) BEFORE the dense grid is
    built: at 100 TB an uncapped web vocabulary is tens of millions of
    tokens x labels, which outgrows a broadcast — every production
    bag-of-words classifier trains on a capped/hashed vocabulary, and
    the tail tokens a cap drops carry near-zero class signal. Class
    totals still count EVERY token (the smoothed denominators stay
    honest); capped-out tokens are simply OOV at scoring time. None
    keeps the full vocabulary (the oracle-attested fixture setting).
    """
    tok = train.select(
        F.col(label).alias("l"), F.explode(tokens(F.col(text))).alias("t")
    )
    counts = tok.groupBy("l", "t").agg(F.count(F.lit(1)).alias("n"))
    counts = counts.persist()
    totals = counts.groupBy("l").agg(F.sum("n").alias("tot"))
    vocab = counts.select("t").distinct()
    if max_vocab is not None:
        top = (
            counts.groupBy("t")
            .agg(F.sum("n").alias("__occ"))
            .orderBy(F.desc("__occ"), F.asc("t"))
            .limit(max_vocab)
        )
        vocab = top.select("t")
    v = vocab.count()  # scalar V — vocabulary size, driver-safe
    model = (
        totals.crossJoin(vocab)  # |labels| x |vocab|: the dense grid
        .join(counts, on=["l", "t"], how="left")
        .select(
            "l",
            "t",
            F.round(
                F.log(
                    (F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tot") + F.lit(alpha * v))
                )
                * quantum,
                0,
            )
            .cast("long")
            .alias("llh_q"),
        )
    )
    # r13 opt (guide §2.3/§5): ONE label-count job replaces the separate
    # n_docs count() scan AND the lazy priors re-scan of the train set —
    # the collected table is |labels| rows (a few dozen at most: the
    # bounded-collect class documented in VERDICT's anti-pattern sweep),
    # and n_docs is its sum. Prior values are computed with the same
    # float(n_docs) literal division, so prior_q is bit-identical.
    lbl_rows = (
        train.groupBy(F.col(label).alias("l"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    n_docs = sum(int(r["cnt"]) for r in lbl_rows)
    priors = (
        train.sparkSession.createDataFrame(
            [(r["l"], int(r["cnt"])) for r in lbl_rows],
            f"l {train.schema[label].dataType.simpleString()}, cnt long",
        )
        .select(
            "l",
            F.round(F.log(F.col("cnt") / F.lit(float(n_docs))) * quantum, 0)
            .cast("long")
            .alias("prior_q"),
        )
    )
    return model, priors


def nb_predict(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score + argmax. Returns (id_col, pred, score_q, margin_q) —
    score_q the winning class's fixed-point score, margin_q its lead
    over the runner-up (0 when labels tie; ties broken by label asc).

    The model join is broadcast (vocabulary-bounded); the only shuffle
    is the per-(doc, label) sum."""
    per_doc = (
        docs.select(F.col(id_col).alias("__id"), F.explode(tokens(F.col(text))).alias("t"))
        .groupBy("__id", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scores = (
        per_doc.join(F.broadcast(model), on="t")  # OOV tokens drop here
        .groupBy("__id", "l")
        .agg(F.sum(F.col("n") * F.col("llh_q")).alias("s"))
        .join(F.broadcast(priors), on="l")
        .select("__id", "l", (F.col("s") + F.col("prior_q")).alias("score_q"))
    )
    w = Window.partitionBy("__id").orderBy(F.desc("score_q"), F.asc("l"))
    ranked = scores.select(
        "__id",
        "l",
        "score_q",
        F.row_number().over(w).alias("__rn"),
        (F.col("score_q") - F.lead("score_q", 1).over(w)).alias("__lead"),
    )
    return ranked.filter(F.col("__rn") == 1).select(
        F.col("__id").alias(id_col),
        F.col("l").alias("pred"),
        "score_q",
        F.coalesce(F.col("__lead"), F.lit(0)).cast("long").alias("margin_q"),
    )
