"""Corpus datasheet: the one-call audit report a training corpus ships
with (Datasheets for Datasets, Gebru et al. 2021, §composition — the
quantitative half).

Long format (section, metric, value): volume totals, language mix,
Gopher-gate pass rate, exact-duplicate rate, token-length quantiles —
every number SQL-replayable so the datasheet itself is oracle-attestable.

Shape at 100 TB: one pass computes per-doc facts (tokens via expressions,
gate verdict via the fused map-only `gopher_quality`, fingerprint), then
a handful of tiny aggregates over that per-doc frame — each result is
metrics-sized. The only shuffles are the fingerprint distinct and the
exact percentile; swap `quantile_mode="approx"` in for the sketch path
at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udata_datalake_service_spark.llm.gopher import gopher_quality
from udata_datalake_service_spark.llm.text import fingerprint_from, tokens


def corpus_datasheet(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    quantile_mode: str = "exact",
) -> DataFrame:
    """Returns (section, metric, value: double), deterministic row set."""
    # token array staged once — the inline form tokenized twice per row
    # (token_count + fingerprint; r13 opt, same device as llm/text.py)
    facts = df.select(
        id_col,
        F.col(lang_col).alias("__lang"),
        F.length(text).cast("long").alias("__nchar"),
        tokens(F.col(text)).alias("__t"),
    ).select(
        id_col,
        "__lang",
        "__nchar",
        F.size("__t").alias("__ntok"),
        fingerprint_from(F.col("__t")).alias("__fp"),
    )
    per_doc = (
        gopher_quality(df, text=text, id_col=id_col)
        .select(id_col, "gopher_pass")
        .join(facts, on=id_col)
    )
    row = lambda section, metric, value: F.struct(  # noqa: E731
        F.lit(section).alias("section"),
        F.lit(metric).alias("metric"),
        value.cast("double").alias("value"),
    )
    quant = (
        F.expr("percentile(__ntok, array(0.5, 0.9))")
        if quantile_mode == "exact"
        else F.expr("approx_percentile(__ntok, array(0.5, 0.9))")
    )
    totals = per_doc.agg(
        F.array(
            row("volume", "n_docs", F.count(F.lit(1))),
            row("volume", "n_tokens", F.sum("__ntok")),
            row("volume", "n_chars", F.sum("__nchar")),
            row("quality", "gopher_pass_rate", F.round(F.avg(F.col("gopher_pass").cast("double")), 6)),
            row(
                "dedup",
                "exact_dup_rate",
                F.round(
                    (F.count(F.lit(1)) - F.count_distinct("__fp"))
                    / F.count(F.lit(1)),
                    6,
                ),
            ),
            row("length", "p50_tokens", quant.getItem(0)),
            row("length", "p90_tokens", quant.getItem(1)),
        ).alias("rows")
    ).select(F.explode("rows").alias("r")).select("r.*")
    # language mix straight off the input — routing it through per_doc
    # would re-run the gopher mapInPandas stage for a branch that only
    # needs (lang, count); the gate is 1:1 per doc so the counts agree
    langs = (
        df.groupBy(F.col(lang_col).alias("__lang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("language").alias("section"),
            F.concat(F.lit("n_docs:"), F.col("__lang")).alias("metric"),
            F.col("n").cast("double").alias("value"),
        )
    )
    return totals.unionByName(langs)
