"""Natural-statistics fixture laws (VERDICT r11 task 2): the generator
must actually have the aggregate statistics the soaks now rely on —
Zipfian unigram mass with a real-stopword head, heavy-tailed document
lengths, partitioning-independent determinism, and an honest (<1.0)
strict-Gopher pass fraction with no fixture hacks."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from udata_datalake_service_spark.llm.synthtext import (
    ZIPF_Q,
    ZIPF_S,
    zipf_cumprobs,
    zipf_documents,
    zipf_vocab,
)


def test_vocab_head_is_real_function_words_and_gopher_covered():
    v = zipf_vocab(10_000)
    assert len(v) == 10_000 and len(set(v)) == 10_000
    from udata_datalake_service_spark.llm.gopher import GOPHER_STOPWORDS

    head = set(v[:60])
    assert set(GOPHER_STOPWORDS) <= head, "Gopher stopwords must sit in the head"
    assert v[0] == "the"
    # tail is letters-only (Gopher alpha-word rule satisfiable by content)
    assert all(w.isalpha() for w in v)


def test_zipf_mass_matches_published_shape():
    cum = zipf_cumprobs(10_000, ZIPF_S, ZIPF_Q)
    p1, head50 = cum[0], cum[49]
    assert 0.03 < p1 < 0.06  # 'the' ≈ 4-5% of tokens in English
    assert 0.35 < head50 < 0.50  # function-word mass


def test_documents_deterministic_and_partitioning_independent(spark):
    a = zipf_documents(spark, 64, seed="s1").collect()
    b = zipf_documents(spark, 64, seed="s1", num_partitions=7).collect()
    assert sorted((r["doc_id"], r["text"]) for r in a) == sorted(
        (r["doc_id"], r["text"]) for r in b
    )
    c = zipf_documents(spark, 64, seed="s2").collect()
    assert sorted(r["text"] for r in a) != sorted(r["text"] for r in c)


def test_corpus_statistics_are_natural(spark):
    docs = zipf_documents(spark, 400, seed="stats").persist()
    lengths = np.array(
        [r["n"] for r in docs.select(F.size(F.split("text", " ")).alias("n")).collect()]
    )
    # heavy tail: median near 180, a real spread on both sides
    assert 100 < np.median(lengths) < 300
    assert (lengths < 50).mean() > 0.03  # honest sub-floor fraction
    assert lengths.max() > 1000  # the tail is genuinely heavy

    # empirical unigram law: 'the' is the top token at its natural mass
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"))
        .limit(60)
        .collect()
    )
    total = int(sum(lengths))
    assert counts[0]["w"] == "the"
    assert 0.02 < counts[0]["count"] / total < 0.07
    head50 = sum(r["count"] for r in counts[:50]) / total
    assert 0.30 < head50 < 0.55
    # distinct vocabulary actually used is corpus-scale, not 31 tokens
    n_distinct = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w")
        .distinct()
        .count()
    )
    assert n_distinct > 3_000
    docs.unpersist()


def test_strict_gopher_pass_fraction_is_honest(spark):
    """No opener hack: most docs pass the STRICT published gate on their
    own statistics; short docs honestly fail — the fraction must sit
    strictly inside (0.5, 1.0)."""
    from udata_datalake_service_spark.llm.gopher import gopher_quality

    docs = zipf_documents(spark, 300, seed="gate")
    g = gopher_quality(docs, text="text", id_col="doc_id")
    n = g.count()
    n_pass = g.filter(F.col("gopher_pass")).count()
    assert 0.5 < n_pass / n < 1.0, f"{n_pass}/{n}"


def test_pure_python_twin_matches_distributed_generator(spark):
    """zipf_corpus_rows must be row-for-row byte-identical to
    zipf_documents for the same parameters — fixtures written driver-side
    (the curate_zipf oracle corpus) then mean exactly what the
    distributed plane generates."""
    from udata_datalake_service_spark.llm.synthtext import (
        zipf_corpus_rows,
        zipf_documents,
    )

    kw = dict(vocab_size=500, seed="twin-test", median_words=40, max_words=400)
    dist = sorted(
        map(tuple, zipf_documents(spark, 60, num_partitions=7, **kw).collect())
    )
    pure = sorted(zipf_corpus_rows(60, **kw))
    assert dist == pure
