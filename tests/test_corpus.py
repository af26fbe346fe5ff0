"""llm/corpus.py operators: novelty, paragraph dedup, padding waste."""

from __future__ import annotations

from pyspark.sql import functions as F

from udata_datalake_service_spark.llm.corpus import (
    ngram_novelty,
    padding_waste_report,
    paragraph_dedup,
)


def test_ngram_novelty_stream_semantics(spark):
    rows = [
        (1, "a b c d"),        # owns all 3 bigrams
        (2, "a b c e"),        # shares 'a b' 'b c' -> owns only 'c e'
        (3, "a b c d"),        # exact dup of 1 -> owns nothing
        (4, "x"),              # shorter than k -> 0 grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df, k=2).collect()}
    assert (got[1]["n_grams"], got[1]["n_novel"], got[1]["novelty"]) == (3, 3, 1.0)
    assert (got[2]["n_grams"], got[2]["n_novel"]) == (3, 1)
    assert (got[3]["n_grams"], got[3]["n_novel"], got[3]["novelty"]) == (3, 0, 0.0)
    assert (got[4]["n_grams"], got[4]["novelty"]) == (0, 0.0)


def test_paragraph_dedup_split_regex_prose(spark):
    """The real-prose leg: newline-delimited paragraphs, global first
    occurrence wins, later docs reconstruct without the repeats."""
    rows = [
        (1, "alpha beta\n\ngamma delta"),
        (2, "gamma delta\n\nepsilon zeta"),  # first para repeats doc 1's 2nd
        (3, "alpha beta\n\ngamma delta"),    # full dup -> empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, split_regex=r"\n\n+").collect()
    }
    assert got[1]["clean_text"] == "alpha beta\n\ngamma delta"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    assert got[2]["clean_text"] == "epsilon zeta"
    assert (got[3]["n_kept"], got[3]["clean_text"]) == (0, "")


def test_paragraph_dedup_intra_doc_repeat(spark):
    """A paragraph repeated WITHIN one doc is also collapsed to its first
    occurrence (C4 semantics are global, not cross-doc-only)."""
    df = spark.createDataFrame(
        [(1, "p q\n\np q\n\nr s")], "doc_id long, text string"
    )
    got = paragraph_dedup(df, split_regex=r"\n\n+").collect()[0]
    assert (got["n_paras"], got["n_kept"]) == (3, 2)
    assert got["clean_text"] == "p q\n\nr s"


def test_padding_waste_invariants(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100 + 1) for i in range(200)], "doc_id long, n long"
    )
    rows = {r["strategy"]: r for r in padding_waste_report(df, "n", batch_size=16).collect()}
    a, s = rows["arrival"], rows["length_sorted"]
    # same real token mass, same batch count; sorting never pads more
    assert a["real_tokens"] == s["real_tokens"]
    assert a["n_batches"] == s["n_batches"] == 13  # ceil(200/16)
    assert s["padded_tokens"] <= a["padded_tokens"]
    for r in (a, s):
        assert r["padded_tokens"] >= r["real_tokens"]
        assert 0.0 <= r["waste_ratio"] < 1.0


def test_paragraph_dedup_reconstruction_is_lossless_without_dups(spark):
    """With no duplicate paragraphs anywhere, reconstruction returns the
    tokenized text verbatim (order preserved through the index sort).
    Tokens are globally unique by construction — the FIXTURE corpus can't
    serve here because its generator deliberately injects repeated
    cross-doc spans (that's what dd_span_coverage attests)."""

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(7 + (i * 11) % 30)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup(df, para_tokens=10)
    joined = out.join(df, on="doc_id").select(
        "doc_id",
        (F.col("clean_text") == F.col("text")).alias("ok"),
        (F.col("n_kept") == F.col("n_paras")).alias("all_kept"),
    )
    bad = joined.filter(~F.col("ok") | ~F.col("all_kept")).count()
    assert bad == 0


def test_paragraph_dedup_whitespace_variant_collapses(spark):
    """Leading/trailing whitespace must not let repeated boilerplate
    escape the dedup key (paragraphs trim before hashing)."""
    df = spark.createDataFrame(
        [(1, "x\n\ngamma delta"), (2, "y\n\n  gamma delta \n\nz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(df, split_regex=r"\n\n+").collect()}
    assert got[2]["n_kept"] == 2
    assert got[2]["clean_text"] == "y\n\nz"


def test_padding_waste_empty_input_reports_zeros(spark):
    df = spark.createDataFrame([], "doc_id long, n long")
    rows = {r["strategy"]: r for r in padding_waste_report(df, "n").collect()}
    for r in rows.values():
        assert (r["n_batches"], r["real_tokens"], r["padded_tokens"]) == (0, 0, 0)
        assert r["waste_ratio"] == 0.0
