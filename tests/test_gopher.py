"""Goldens for the Gopher quality-rule bundle (Rae et al. 2021 Table A1).

Hand-computed signal values on crafted documents exercise every rule the
synthetic corpus can't light up naturally (bullets, ellipses, duplicate
lines, repeated n-grams, symbol density, non-alpha words)."""

from __future__ import annotations

import pytest

from udata_datalake_service_spark.llm.gopher import (
    base_signals,
    gopher_quality,
    ngram_repetition,
)


def _one(df, doc_id):
    rows = {r["doc_id"]: r.asDict() for r in df.collect()}
    return rows[doc_id]


@pytest.fixture(scope="module")
def qdocs(spark):
    rows = [
        # 1: clean English prose — passes everything except word count
        (1, "the cat sat on the mat and that cat did have fun with all of it"),
        # 2: duplicate lines + bullets + ellipsis endings
        (2, "alpha beta gamma\nalpha beta gamma\n• bullet one\n• bullet two\nend it now..."),
        # 3: heavy 2-gram repetition ("spam ham" x5)
        (3, "spam ham spam ham spam ham spam ham spam ham"),
        # 4: symbols and numeric (non-alpha) words
        (4, "### 123 456 #tag ... 789 000 111 222 333"),
        # 5: empty text
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_base_signals_goldens(spark, qdocs):
    out = base_signals(qdocs)
    r1 = _one(out, 1)
    assert r1["n_words"] == 16
    # 48 word chars / 16 words
    assert r1["mean_word_len"] == 3.0
    assert r1["symbol_word_ratio"] == 0.0
    assert r1["frac_alpha_words"] == 1.0
    # distinct hits: the, of, and, that, have, with
    assert r1["n_stop_hits"] == 6
    assert r1["dup_line_frac"] == 0.0

    r2 = _one(out, 2)
    assert r2["n_words"] == 15
    # 5 lines, 1 duplicated
    assert r2["dup_line_frac"] == round(1 / 5, 6)
    # dup chars: "alpha beta gamma" = 16 chars repeated once / total line chars
    total_line_chars = 16 + 16 + 12 + 12 + 13
    assert r2["dup_line_char_frac"] == round(16 / total_line_chars, 6)
    assert r2["bullet_line_frac"] == round(2 / 5, 6)
    assert r2["ellipsis_line_frac"] == round(1 / 5, 6)

    r4 = _one(out, 4)
    # words: ### 123 456 #tag ... 789 000 111 222 333 -> 10 words
    assert r4["n_words"] == 10
    # '#' count = 4, '...' = 1  -> 5/10
    assert r4["symbol_word_ratio"] == 0.5
    # only '#tag' contains a letter
    assert r4["frac_alpha_words"] == round(1 / 10, 6)

    r5 = _one(out, 5)
    assert r5["n_words"] == 0
    assert r5["mean_word_len"] == 0.0
    assert r5["dup_line_frac"] == 0.0


def test_ngram_repetition_goldens(spark, qdocs):
    out = gopher_quality(qdocs)
    r3 = _one(out, 3)
    # "spam ham" x5: words=10, word_chars=35 (weirdly 5*4+5*3)
    # 2-grams: "spam ham" x5 (8 chars each... 7 word chars), "ham spam" x4
    # top2 = 5 * 7 = 35 -> 35/35 = 1.0
    assert r3["top2gram_char_frac"] == 1.0
    # 3-grams: "spam ham spam" x4 (11 wchars), "ham spam ham" x4 -> 44/35
    assert r3["top3gram_char_frac"] == round(44 / 35, 6)
    # 5-grams: 6 grams, "s h s h s"(18) x3, "h s h s h"(17) x3 -> all dup
    # dup5 = 3*18 + 3*17 = 105 -> 105/35 = 3.0
    assert r3["dup5gram_char_frac"] == 3.0
    # 10-gram occurs once -> no dup
    assert r3["dup10gram_char_frac"] == 0.0
    assert not r3["gopher_pass"]

    r1 = _one(out, 1)
    # no repeated 2-gram in doc 1; top is a single 8-char gram (7 word
    # chars, e.g. "that cat") -> 7/48
    assert r1["top2gram_char_frac"] == round(7 / 48, 6)
    assert r1["dup5gram_char_frac"] == 0.0

    r5 = _one(out, 5)
    assert r5["top2gram_char_frac"] == 0.0
    assert r5["n_fail"] >= 1  # word count rule


def test_gopher_pass_on_long_clean_doc(spark):
    # stopword-rich opener once, then unique words — no repeated n-grams
    text = (
        "the quick brown fox jumps over that lazy dog and dogs have played "
        "with plenty of patience watching every single visitor today "
        + " ".join(f"uniq{i:02d} tokn{i:02d}" for i in range(20))
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(gopher_quality(df), 1)
    assert r["n_words"] >= 50
    assert r["gopher_pass"], r
    assert r["n_fail"] == 0


def test_top_ngram_uses_most_frequent_not_max_product(spark):
    """Rae et al.: the fraction is the characters of the MOST FREQUENT
    n-gram — a once-occurring long gram must not outrank a twice-occurring
    short one (max(count*chars) would pick the wrong gram here)."""
    text = "aa bb aa bb aa cc internationalization standardization"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(gopher_quality(df), 1)
    # most frequent 2-grams: "aa bb" x2 and "bb aa" x2 (4 word-chars each)
    # -> 2*4 = 8 over word_chars = 6*2 + 20 + 15 = 47
    assert r["top2gram_char_frac"] == round(8 / 47, 6)
