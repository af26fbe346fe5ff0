"""Gopher-style document quality rules (Rae et al. 2021, Table A1).

The canonical pretraining quality gate: per-document structural signals
(word count, mean word length, symbol density, bullet/ellipsis line
ratios, alphabetic-word fraction, required-stopword presence) plus the
repetition family (duplicate lines, top n-gram character fraction for
n=2..4, duplicated n-gram character fraction for n=5..10), each compared
against the published thresholds to a single pass/fail verdict.

No reference counterpart (udata-hydra has no training-data plane); this
sits in the beyond-reference LLM pipeline next to `text.quality_score`
(which is a cheap heuristic — THIS is the published rule set).

Execution shape, 100 TB first:

- Everything except the n-gram family is a pure column expression over
  one row — whole-stage codegen, zero shuffle, runs at scan speed.
  The duplicate-line character fraction uses a nested higher-order
  aggregate (O(lines × distinct lines) per doc) — documents have
  bounded line counts, so this stays cheaper than a per-line explode
  and keeps the stage map-only.
- The n-gram family is ALSO per-document (intra-doc repetition), so it
  runs as one Arrow-batched ``mapInPandas`` stage fused behind the same
  scan — see `ngram_repetition` for the measured case against the
  declarative explode+groupBy form. Nothing shuffles, nothing collects.

Definitions pinned here (reimplementations differ; the DuckDB oracle
replays these exactly):
- a *word* is a whitespace-delimited token (case preserved for alpha /
  symbol checks, lowercased for gram identity and stopwords);
- gram character length counts word characters only
  (``length(gram) - (n-1)`` joining spaces excluded), and fractions are
  over total word characters, not raw text length;
- top-n-gram fraction uses the characters of the single MOST FREQUENT
  n-gram (count ties resolve to the longest such gram — deterministic
  in both engines); duplicated-n-gram fraction sums characters over ALL
  occurrences of every gram seen more than once (the simple sum, not
  interval-union coverage — see `dedup.duplicated_span_coverage` for
  the coverage form across documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Rae et al. 2021 Table A1: "contain at least two of the following
# English words" — the required-stopword presence gate.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)
# published thresholds: fraction of characters in the most frequent
# n-gram (n=2..4) / in duplicated n-grams (n=5..10)
TOP_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
# Deviation from Rae et al. Table A1, kept deliberately: the paper applies
# the 0.10 bound to the hash ratio and the ellipsis ratio SEPARATELY; this
# gate sums them into one symbol_word_ratio before the same bound, i.e. a
# strictly stricter rejection. Both engines implement the summed form, so
# the oracle replay is exact; splitting it is a one-line change on each
# side if paper-exact behavior is ever needed.
MAX_SYMBOL_WORD_RATIO = 0.10
MAX_BULLET_LINE_FRAC = 0.90
MAX_ELLIPSIS_LINE_FRAC = 0.30
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORD_HITS = 2
MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = 0.20

# explicit whitespace class, not \s: Java's \s includes \x0B, RE2's
# (the DuckDB oracle) does not — same portability rule as WS_CLASS below
_BULLET_RE = r"^[ \t\n\r\f\x0B]*[•‣▪\-\*]"
_ELLIPSIS_RE = r"(\.\.\.|…)[ \t\n\r\f\x0B]*$"


# Explicit ASCII whitespace class, identical in all three engines: Java's
# \s includes \x0B but RE2's (the DuckDB oracle) does NOT — a bare \s+
# would tokenize a vertical-tab document differently per engine.
WS_CLASS = "[ \t\n\r\f\x0B]+"


def _words(text_col: Column) -> Column:
    """Whitespace-delimited words, case preserved."""
    return F.filter(F.split(text_col, WS_CLASS), lambda w: w != "")


def _lines(text_col: Column) -> Column:
    """Non-blank lines (a blank line is structure, not content).

    Splits on ``\r?\n`` so CRLF documents don't turn every blank line
    into a non-blank '\r' line (trim strips only spaces), which inflated
    dup_line_frac enough to flunk clean Windows-formatted text."""
    return F.filter(F.split(text_col, r"\r?\n"), lambda l: F.trim(l) != "")


def base_signals(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """The map-only signal block: one projection, no shuffle.
    ``keep_text`` carries the raw text through as ``__text`` so
    `gopher_quality` can fuse the n-gram pandas stage with zero joins."""
    # total over NULL text: size(NULL) would propagate to a NULL verdict
    # that belongs to neither the pass nor the fail partition, breaking
    # survivorship reconciliation — NULL reads as the empty document
    t0 = F.coalesce(F.col(text), F.lit(""))
    # r13 opt (guide §1.3/§4): stage the word/line arrays ONCE. Inlined,
    # every signal expression below re-ran the full regex split —
    # higher-order lambdas sit outside codegen subexpression elimination,
    # so the single Project evaluated split(text, WS) ~12× and
    # split(text, \r?\n) ~12× per row (plans/r13/gopher_quality_before.txt),
    # plus one more line-split per DISTINCT line inside the dup_line_chars
    # nested aggregate. CollapseProject keeps the staging projection: the
    # aliases are non-cheap and multiply referenced.
    staged = df.select(
        F.col(id_col),
        _words(t0).alias("__w"),
        _lines(t0).alias("__lines"),
        t0.alias("__t"),
    )
    t = F.col("__t")
    w = F.col("__w")
    lines = F.col("__lines")
    nw = F.size(w)
    nl = F.size(lines)
    word_chars = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    # chars of every repeat beyond a line's first occurrence
    dup_line_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, d: acc
        + (F.size(F.filter(lines, lambda l: l == d)) - 1) * F.length(d),
    )
    frac = lambda num, den: F.when(den > 0, F.round(num.cast("double") / den, 6)).otherwise(F.lit(0.0))  # noqa: E731
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(w, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return staged.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        frac(word_chars, nw).alias("mean_word_len"),
        frac(
            F.regexp_count(t, F.lit(r"#"))
            + F.regexp_count(t, F.lit(r"\.\.\."))
            + F.regexp_count(t, F.lit(r"…")),
            nw,
        ).alias("symbol_word_ratio"),
        frac(F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))), nw).alias(
            "frac_alpha_words"
        ),
        stop_hits.cast("long").alias("n_stop_hits"),
        frac(F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE))), nl).alias(
            "bullet_line_frac"
        ),
        frac(F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_RE))), nl).alias(
            "ellipsis_line_frac"
        ),
        frac(nl - F.size(F.array_distinct(lines)), nl).alias("dup_line_frac"),
        frac(dup_line_chars, line_chars).alias("dup_line_char_frac"),
        word_chars.alias("_word_chars"),
        *([t.alias("__text")] if keep_text else []),
    )


def _ngram_stat_columns_py(texts):
    """Reference (pure-Python Counter) form of `_ngram_stat_columns` —
    kept as the agreement oracle for the vectorized kernel below; per
    (doc, n) it builds a Counter over word-tuple windows.
    """
    import re as _re
    from collections import Counter

    # the Python replica of WS_CLASS (\x0B == \v); str.split()/re \s
    # would also split on NBSP and friends, which the engines don't
    ws = _re.compile(r"[ \t\n\r\f\v]+")
    out = {f"_top{n}": [] for n in TOP_NS}
    out.update({f"_dup{n}": [] for n in DUP_NS})
    for text in texts:
        words = [w.lower() for w in ws.split(text or "") if w]
        for n in TOP_NS + DUP_NS:
            key = f"_top{n}" if n in TOP_NS else f"_dup{n}"
            if len(words) < n:
                out[key].append(0)
                continue
            counts = Counter(
                tuple(words[i : i + n]) for i in range(len(words) - n + 1)
            )
            if n in TOP_NS:
                mc = max(counts.values())
                val = max(
                    c * sum(map(len, g))
                    for g, c in counts.items()
                    if c == mc
                )
            else:
                val = sum(
                    c * sum(map(len, g)) for g, c in counts.items() if c > 1
                )
            out[key].append(val)
    return out


def _ngram_stat_columns(texts):
    """Per-document top/dup n-gram character sums for one pandas batch.

    Vectorized whole-batch formulation (the Counter loop was the whole
    pandas stage's cost — ~45 M tuple constructions at sf0.1): ALL
    documents in the Arrow batch concatenate into one word stream, words
    map to integer ids with ONE hash-based ``pd.factorize``, and gram
    ids build by CHAINED factorization — the (n)-gram class at position
    ``i`` is ``factorize(class_{n-1}[i] * K + word_id[i+n-1])`` with
    ``K = total_words + 1`` (codes are dense < K, so the combine key is
    injective — exact equivalence classes, no hash collisions). The
    1-gram classes are DOC-AWARE (``factorize(doc_idx * K + word_id)``),
    so counts never mix documents, and windows that straddle a document
    boundary are remapped to unique negative sentinels before each
    factorize so they form singleton classes that real grams can't
    merge with. Per-doc reductions are ``np.bincount`` / ``maximum.at``
    over the doc index of each position. With ``P`` the prefix sum of
    word lengths, gram char length at position ``i`` is ``P[i+n]-P[i]``,
    so

    - top-n value  = max_count * max(charlen where count == max_count)
      (identical to "count ties resolve to the longest gram" — every
      distinct gram with count c occupies c positions);
    - dup-n value  = Σ charlen over positions whose count > 1
      (each distinct gram with count c contributes c×charlen).

    Exact-match equality with `_ngram_stat_columns_py` is pinned by a
    hypothesis agreement test. Returns a dict of 9 equal-length lists.
    """
    import re as _re

    import numpy as np
    import pandas as pd

    ws = _re.compile(r"[ \t\n\r\f\v]+")
    docs_words = [
        [w.lower() for w in ws.split(t or "") if w] for t in texts
    ]
    ndocs = len(docs_words)
    res = {f"_top{n}": np.zeros(ndocs, dtype=np.int64) for n in TOP_NS}
    res.update({f"_dup{n}": np.zeros(ndocs, dtype=np.int64) for n in DUP_NS})
    nws = np.fromiter((len(w) for w in docs_words), dtype=np.int64, count=ndocs)
    total = int(nws.sum())
    if total == 0:
        return {k: v.tolist() for k, v in res.items()}
    flat = np.empty(total, dtype=object)
    pos = 0
    for wlist in docs_words:
        flat[pos : pos + len(wlist)] = wlist
        pos += len(wlist)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), nws)
    ids = pd.factorize(flat)[0].astype(np.int64)
    lens = np.fromiter((len(w) for w in flat), dtype=np.int64, count=total)
    prefix = np.concatenate(([0], np.cumsum(lens)))
    K = np.int64(total + 1)
    # doc-aware 1-gram classes: same word in two docs is two classes
    codes = pd.factorize(doc_of * K + ids)[0].astype(np.int64)
    cur_n = 1
    for n in sorted(TOP_NS + DUP_NS):
        while cur_n < n:
            combined = codes[:-1] * K + ids[cur_n:]
            # windows straddling a doc boundary → unique sentinel classes
            cross = np.nonzero(doc_of[: total - cur_n] != doc_of[cur_n:])[0]
            if cross.size:
                combined[cross] = -(cross + 1)
            codes = pd.factorize(combined)[0].astype(np.int64)
            cur_n += 1
        m = total - n + 1
        if m <= 0:
            break  # no doc is long enough for this or any larger n
        valid = doc_of[:m] == doc_of[n - 1 :]
        cnt_pos = np.bincount(codes)[codes]
        charlen = prefix[n:] - prefix[:-n]
        dpos = doc_of[:m]
        key = f"_top{n}" if n in TOP_NS else f"_dup{n}"
        if n in TOP_NS:
            mc = np.zeros(ndocs, dtype=np.int64)
            np.maximum.at(mc, dpos[valid], cnt_pos[valid])
            is_max = valid & (cnt_pos == mc[dpos])
            ml = np.zeros(ndocs, dtype=np.int64)
            np.maximum.at(ml, dpos[is_max], charlen[is_max])
            res[key] = mc * ml
        else:
            mask = valid & (cnt_pos > 1)
            res[key] = np.bincount(
                dpos[mask], weights=charlen[mask], minlength=ndocs
            ).astype(np.int64)
    return {k: v.tolist() for k, v in res.items()}


def ngram_repetition(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-(doc) top/dup n-gram character sums — map-only.

    These are INTRA-document statistics, so no shuffle is ever needed:
    an Arrow-batched ``mapInPandas`` computes a Counter over word-tuple
    windows per document and emits 9 numbers. The declarative
    alternative (explode (doc, n, gram) → two groupBys) pays two
    shuffles AND evaluates the per-position gram lambdas in Spark's
    interpreted higher-order-function path — measured 15-19 s at sf0.1
    (5 k docs × ~1 k windows each) vs ~3 s for this form; the Python
    loop is C-backed (tuple hashing + Counter) and the batch transfer is
    columnar. Exactly replayable in SQL (the oracle groups real gram
    strings; values match because only counts×lengths survive).
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    fields = [f"_top{n}" for n in TOP_NS] + [f"_dup{n}" for n in DUP_NS]
    # id type derives from the input (string/uuid doc ids are routine in
    # dedup pipelines; a hardcoded long schema crashed Arrow conversion)
    schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + [StructField(f, LongType()) for f in fields]
    )

    def compute(batches):
        for pdf in batches:
            stats = _ngram_stat_columns(pdf[text].tolist())
            res = pd.DataFrame({id_col: pdf[id_col]})
            for f in fields:
                res[f] = stats[f]
            yield res

    return df.select(id_col, text).mapInPandas(compute, schema=schema)


def gopher_quality(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Full Gopher rule table: every signal column, the number of failed
    rules, and the pass verdict.

    Fully MAP-ONLY: the expression block computes the structural signals
    and carries the text into one Arrow-batched ``mapInPandas`` stage
    that appends the 9 n-gram repetition sums (see `ngram_repetition` —
    intra-document stats need no shuffle), then the thresholds are plain
    expressions. A 100 TB run is a single scan-shaped stage."""
    import pandas as pd

    base = base_signals(df, text=text, id_col=id_col, keep_text=True)
    fields = [f"_top{n}" for n in TOP_NS] + [f"_dup{n}" for n in DUP_NS]
    kept = [f for f in base.schema.fields if f.name != "__text"]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in kept]
        + [f"{f} long" for f in fields]
    )

    def compute(batches):
        for pdf in batches:
            stats = _ngram_stat_columns(pdf["__text"].tolist())
            res = pdf.drop(columns=["__text"])
            for f in fields:
                res[f] = stats[f]
            yield res

    j = base.mapInPandas(compute, schema=schema)
    gfrac = lambda c: F.when(  # noqa: E731
        F.col("_word_chars") > 0,
        F.round(F.coalesce(c, F.lit(0)).cast("double") / F.col("_word_chars"), 6),
    ).otherwise(F.lit(0.0))
    for n in TOP_NS:
        j = j.withColumn(f"top{n}gram_char_frac", gfrac(F.col(f"_top{n}")))
    for n in DUP_NS:
        j = j.withColumn(f"dup{n}gram_char_frac", gfrac(F.col(f"_dup{n}")))
    fails = [
        (F.col("n_words") < MIN_WORDS) | (F.col("n_words") > MAX_WORDS),
        (F.col("mean_word_len") < MIN_MEAN_WORD_LEN)
        | (F.col("mean_word_len") > MAX_MEAN_WORD_LEN),
        F.col("symbol_word_ratio") > MAX_SYMBOL_WORD_RATIO,
        F.col("bullet_line_frac") > MAX_BULLET_LINE_FRAC,
        F.col("ellipsis_line_frac") > MAX_ELLIPSIS_LINE_FRAC,
        F.col("frac_alpha_words") < MIN_ALPHA_WORD_FRAC,
        F.col("n_stop_hits") < MIN_STOPWORD_HITS,
        F.col("dup_line_frac") > MAX_DUP_LINE_FRAC,
        F.col("dup_line_char_frac") > MAX_DUP_LINE_CHAR_FRAC,
    ]
    for n in TOP_NS:
        fails.append(F.col(f"top{n}gram_char_frac") > TOP_MAX[n])
    for n in DUP_NS:
        fails.append(F.col(f"dup{n}gram_char_frac") > DUP_MAX[n])
    n_fail = sum(f.cast("int") for f in fails)
    return j.withColumn("n_fail", n_fail.cast("long")).withColumn(
        "gopher_pass", F.col("n_fail") == 0
    ).drop("_word_chars", *[f"_top{n}" for n in TOP_NS], *[f"_dup{n}" for n in DUP_NS])
