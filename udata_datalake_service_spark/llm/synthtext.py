"""Natural-statistics synthetic corpus generator (VERDICT r11 task 2).

Every corpus-level soak number in rounds ≤11 rested on the testdata
documents table's ~31-token vocabulary, which SOAK.md had to caveat
three ways: the term-bucket pruning "won" even on whole-document
probes only because any doc's term set was tiny; near-dup removed 61 %
because UNRELATED docs share shingles; and the strict-Gopher pass
fraction was driven by a hand-prepended stopword opener. This module
replaces that fixture with text whose aggregate statistics match
natural language, so those three numbers transfer:

* **Zipf-Mandelbrot unigram law** ``p(r) ∝ 1/(r+q)^s`` with s=1.07,
  q=2.7 over a ~10⁴-word vocabulary — top word ≈4.4 % of tokens,
  top-50 ≈41 % (the measured shape of English; Zipf 1949, Mandelbrot
  1953). The head ranks are REAL English function words in
  natural-frequency order — including all eight Gopher required
  stopwords at their genuine ranks — so quality gates exercise their
  published thresholds instead of a fixture hack; the tail is
  deterministic letters-only pseudowords with content-word lengths.
* **Heavy-tailed document lengths**: lognormal(median=180 words,
  σ=1.0), clipped to [5, 20 000] — ≈10 % of docs genuinely fall under
  Gopher's 50-word floor and honestly fail the strict gate.
* **Determinism**: each doc's text is a pure function of
  (seed, doc_id) — independent of partitioning, executor count, or
  run order — so exact-dup tiers built by copying stay byte-identical
  and every soak is reproducible.

Execution shape: generation runs as one Arrow-batched ``mapInPandas``
over ``spark.range`` — embarrassingly parallel, no shuffle, no driver
data; the vocabulary table (~10⁴ short strings) ships once per
executor in the task closure. Sampling is inverse-CDF via
``searchsorted`` on the precomputed cumulative mass — O(len·log V)
per document.

No reference counterpart (fixture infrastructure for the
beyond-reference LLM plane); public-statistics sources cited above.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# Real English function words in approximate natural-frequency order
# (standard frequency-list head). The eight Gopher required stopwords —
# the, be, to, of, and, that, have, with — all sit in this head at
# their genuine ranks, giving a 50-word doc an expected ~10 hits.
_HEAD_WORDS = (
    "the of and a to in is you that it he was for on are as with his "
    "they i at be this have from or one had by word but not what all "
    "were we when your can said there use an each which she do how "
    "their if will up other about out many then them these so some her "
    "would make like him into time has look two more write go see"
).split()

ZIPF_S = 1.07
ZIPF_Q = 2.7


def _pseudoword(rng: np.random.Generator) -> str:
    """Letters-only content word, length 3-12 centered ~7 (natural
    content-word lengths, keeping Gopher's 3-10 mean-word-length band
    satisfiable once the short function-word head mixes in)."""
    n = int(np.clip(rng.normal(7.0, 2.0), 3, 12))
    return "".join(chr(ord("a") + c) for c in rng.integers(0, 26, n))


def zipf_vocab(size: int = 10_000, seed: int = 7) -> list[str]:
    """Deterministic vocabulary: real function-word head + pseudoword
    tail, no duplicates, ``size`` entries."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = list(_HEAD_WORDS[:size])
    seen = set(vocab)
    while len(vocab) < size:
        w = _pseudoword(rng)
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def zipf_cumprobs(size: int, s: float = ZIPF_S, q: float = ZIPF_Q) -> np.ndarray:
    """Cumulative Zipf-Mandelbrot mass over ranks 1..size."""
    p = 1.0 / (np.arange(1, size + 1, dtype=np.float64) + q) ** s
    p /= p.sum()
    return np.cumsum(p)


def _doc_rng(seed: str, doc_id: int) -> np.random.Generator:
    # sha256 → 8-byte stream seed: partitioning-independent determinism
    h = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def doc_text(
    vocab: np.ndarray,
    cum: np.ndarray,
    seed: str,
    doc_id: int,
    log_median: float,
    sigma: float,
    min_words: int,
    max_words: int,
) -> str:
    """One document's text — the single source of truth for BOTH the
    distributed generator (`zipf_documents`) and the pure-python twin
    (`zipf_corpus_rows`), so a fixture written driver-side is
    byte-identical to the mapInPandas output for the same (seed, id)."""
    rng = _doc_rng(seed, doc_id)
    n = int(np.clip(rng.lognormal(log_median, sigma), min_words, max_words))
    idx = np.searchsorted(cum, rng.random(n), side="left")
    return " ".join(vocab[np.minimum(idx, len(vocab) - 1)])


def zipf_corpus_rows(
    n_docs: int,
    vocab_size: int = 10_000,
    seed: str = "zipf0",
    median_words: int = 180,
    sigma: float = 1.0,
    min_words: int = 5,
    max_words: int = 20_000,
    langs: tuple[str, ...] = ("en", "fr", "es", "de"),
    sources: tuple[str, ...] = ("web", "news", "wiki", "forum"),
) -> list[tuple]:
    """Pure-python twin of `zipf_documents`: the same rows, no Spark —
    for writing small deterministic fixtures (e.g. the `curate_zipf`
    oracle corpus) that a SQL engine can read next to the Spark run.
    `tests/test_synthtext.py` pins row-for-row equality with the
    distributed generator."""
    vseed = int.from_bytes(hashlib.sha256(f"v:{seed}".encode()).digest()[:4], "big")
    vocab = np.array(zipf_vocab(vocab_size, seed=vseed))
    cum = zipf_cumprobs(vocab_size)
    log_median = float(np.log(median_words))
    out = []
    for i in range(n_docs):
        t = doc_text(vocab, cum, seed, i, log_median, sigma, min_words, max_words)
        out.append(
            (i, t, langs[i % len(langs)], sources[i // 7 % len(sources)], len(t))
        )
    return out


def zipf_documents(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 10_000,
    seed: str = "zipf0",
    median_words: int = 180,
    sigma: float = 1.0,
    min_words: int = 5,
    max_words: int = 20_000,
    langs: tuple[str, ...] = ("en", "fr", "es", "de"),
    sources: tuple[str, ...] = ("web", "news", "wiki", "forum"),
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) — the documents-table
    schema, with natural-statistics text. See module doc for the laws
    the output satisfies and the tests that pin them."""
    # hashlib, not hash(): str hash is per-process randomized and would
    # silently break cross-run determinism
    vseed = int.from_bytes(hashlib.sha256(f"v:{seed}".encode()).digest()[:4], "big")
    vocab = np.array(zipf_vocab(vocab_size, seed=vseed))
    cum = zipf_cumprobs(vocab_size)
    lang_arr, src_arr = list(langs), list(sources)
    log_median = float(np.log(median_words))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = [
                doc_text(
                    vocab, cum, seed, int(i), log_median, sigma,
                    min_words, max_words,
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": [lang_arr[int(i) % len(lang_arr)] for i in ids],
                    "source": [src_arr[int(i) // 7 % len(src_arr)] for i in ids],
                    "n_chars": [len(t) for t in texts],
                }
            )

    rng_df = spark.range(n_docs)
    if num_partitions:
        rng_df = rng_df.repartition(num_partitions)
    return rng_df.mapInPandas(
        gen,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
