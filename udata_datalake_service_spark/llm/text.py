"""Text analysis operators over a document corpus.

All pure column expressions (whole-stage codegen, no UDFs): at 100 TB these
run at parquet-scan speed with zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-z0-9]+"

# tiny per-language function-word sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "para", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "für", "mit", "nicht"),
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(text_col: Column) -> Column:
    """Lowercased word tokens; the regex is replayable in ANSI SQL."""
    arr = F.split(F.lower(text_col), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != "")


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


# GPT-2-style pre-tokenizer, minus the `\s+(?!\S)` lookahead (RE2-portable;
# Java and RE2 agree on \p{L}/\p{N}, verified Spark≡DuckDB on goldens)
BPE_SPLIT_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text_col: Column) -> Column:
    """Pre-tokenizer piece count — the cheap proxy for LLM token budgeting
    (a real BPE merge table only subdivides these pieces further)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_SPLIT_RE), F.lit(0)))


def punct_ratio(text_col: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    total = F.length(text_col)
    clean = F.length(F.regexp_replace(text_col, r"[a-zA-Z0-9\s]", ""))
    return F.when(total > 0, clean.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(text_col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return stopword_ratio_from(tokens(text_col), stopwords)


def stopword_ratio_from(
    toks: Column, stopwords: tuple[str, ...] = STOPWORDS
) -> Column:
    """`stopword_ratio` from a staged token-array column (r13 opt)."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def word_bigrams(toks: Column) -> Column:
    """Adjacent word pairs ("a b") from a token array — empty for fewer
    than two tokens. The ONE bigram builder (repetition_ratio, DSIR)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(text_col: Column) -> Column:
    """Fraction of duplicated word bigrams — the classic repetition signal
    training-data pipelines gate on (boilerplate, keyword stuffing,
    degenerate generations score high). Pure expressions: slice+zip_with
    builds the bigram list, array_distinct counts the unique ones; exactly
    replayable in DuckDB with list_transform/list_distinct."""
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = word_bigrams(toks)
    nb = F.size(bigrams)
    dup = nb - F.size(F.array_distinct(bigrams))
    return F.when(n >= 2, dup.cast("double") / nb).otherwise(F.lit(0.0))


# portable across Java regex and RE2/DuckDB: no lookaround, no backrefs
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"

# PII patterns (same portability contract). Order of application matters and
# is baked into redact_pii/pii_counts: emails first (their digit runs would
# otherwise feed the phone pattern), then IPv4 (dotted digits also look
# phone-ish), then phones.
EMAIL_CASED_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d().\- ]{6,}\d"


def url_count(text_col: Column) -> Column:
    """Link density — a link-farm / boilerplate curation gate."""
    return F.regexp_count(text_col, F.lit(URL_RE))


def email_count(text_col: Column) -> Column:
    """Email-address density — the cheap PII-exposure signal (a real PII
    pass adds phone/ID patterns and NER; the plumbing is identical)."""
    return F.regexp_count(F.lower(text_col), F.lit(EMAIL_RE))


def redact_pii(text_col: Column) -> Column:
    """Staged PII redaction: emails → ``<EMAIL>``, IPv4 → ``<IP>``, phone
    numbers → ``<PHONE>``. Pure regexp_replace cascade (whole-stage
    codegen; a 100 TB redaction pass runs at scan speed). The regex set is
    the cheap pattern tier of a production PII pass — an NER tier slots in
    behind the same column contract as a pandas UDF when model inference
    is warranted."""
    s1 = F.regexp_replace(text_col, EMAIL_CASED_RE, "<EMAIL>")
    s2 = F.regexp_replace(s1, IPV4_RE, "<IP>")
    return F.regexp_replace(s2, PHONE_RE, "<PHONE>")


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-category PII hit counts, counted on the same staged strings the
    redaction sees (an IPv4 inside an email never double-counts)."""
    s1 = F.regexp_replace(text_col, EMAIL_CASED_RE, "<EMAIL>")
    s2 = F.regexp_replace(s1, IPV4_RE, "<IP>")
    return {
        "n_emails": F.regexp_count(text_col, F.lit(EMAIL_CASED_RE)),
        "n_ips": F.regexp_count(s1, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(s2, F.lit(PHONE_RE)),
    }


def quality_score(text_col: Column) -> Column:
    """Composite heuristic in [0,1]: length band + low punctuation + healthy
    stopword rate + mean word length band. Deterministic, SQL-replayable."""
    n_tok = token_count(text_col)
    mean_wlen = F.when(
        n_tok > 0,
        F.length(F.regexp_replace(F.lower(text_col), r"[^a-z0-9]", "")).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    length_ok = (n_tok >= 5) & (n_tok <= 100000)
    punct_ok = punct_ratio(text_col) <= 0.2
    stop_ok = stopword_ratio(text_col) >= 0.01
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    score = (
        length_ok.cast("double") * 0.4
        + punct_ok.cast("double") * 0.2
        + stop_ok.cast("double") * 0.2
        + wlen_ok.cast("double") * 0.2
    )
    return F.round(score, 4)


def quality_score_from(text_col: Column, toks: Column) -> Column:
    """`quality_score` from a staged token-array column (r13 opt).

    Value-identical to `quality_score`: the alphanumeric character count
    it derives mean word length from is ``length(regexp_replace(lower(
    text), '[^a-z0-9]', ''))`` there and ``length(array_join(toks, ''))``
    here — the token array is exactly the maximal ``[a-z0-9]+`` runs of
    ``lower(text)``, so their concatenation is the same string (pinned by
    test). The punctuation leg still reads ``text`` (it counts characters
    the tokenizer discards).
    """
    n_tok = F.size(toks)
    mean_wlen = F.when(
        n_tok > 0,
        F.length(F.array_join(toks, "")).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    length_ok = (n_tok >= 5) & (n_tok <= 100000)
    punct_ok = punct_ratio(text_col) <= 0.2
    stop_ok = stopword_ratio_from(toks) >= 0.01
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    score = (
        length_ok.cast("double") * 0.4
        + punct_ok.cast("double") * 0.2
        + stop_ok.cast("double") * 0.2
        + wlen_ok.cast("double") * 0.2
    )
    return F.round(score, 4)


def fingerprint_from(toks: Column) -> Column:
    """`fingerprint` from a staged token-array column (r13 opt)."""
    return F.md5(F.array_join(toks, " "))


def language_scores(text_col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (the core of n-gram language ID)."""
    return language_scores_from(tokens(text_col))


def language_scores_from(toks: Column) -> dict[str, Column]:
    """`language_scores` from a STAGED token-array column (r13 opt).

    Tokenizing is the dominant text-plane expression and higher-order
    functions are excluded from codegen subexpression elimination, so an
    inline ``tokens(text)`` here re-runs the full-document regex split
    once per language. Call-sites on the hot path project the token
    array first and pass the attribute.
    """
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def detect_language(text_col: Column, min_hits: int = 1) -> Column:
    """argmax over language marker counts; 'und' when nothing matches.
    Deterministic tie-break: language name order."""
    return detect_language_from(tokens(text_col), min_hits=min_hits)


def detect_language_from(toks: Column, min_hits: int = 1) -> Column:
    """`detect_language` from a staged token-array column (r13 opt).

    The argmax is a single ``array_max`` over (score, -rank, lang)
    structs instead of a CASE-WHEN fold: the fold references each
    per-language hit count ~3× (comparison + both branches), and each
    reference re-evaluates the marker-filter lambda over the whole token
    array; the struct form evaluates each hit count exactly once.
    Identical result: struct ordering compares score first, then -rank,
    so ties resolve to the earliest language in sorted-name order —
    exactly the fold's strict-``>`` tie-break.
    """
    return detect_language_from_hits(language_scores_from(toks), min_hits=min_hits)


def detect_language_from_hits(
    hits: dict[str, Column], min_hits: int = 1
) -> Column:
    """The `detect_language` argmax over already-computed per-language
    hit-count columns (r13 opt — see `detect_language_from`): max of
    (score, -rank, lang) structs, ties to the earliest sorted language."""
    entries = []
    for i, (lang, hit) in enumerate(sorted(hits.items())):
        entries.append(
            F.struct(
                hit.alias("s"), F.lit(-i).alias("ni"), F.lit(lang).alias("l")
            )
        )
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] >= F.lit(min_hits), best["l"]).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """Document fingerprint: md5 over the normalized token stream — the
    canonical-form content hash used for exact dedup."""
    return fingerprint_from(tokens(text_col))


def rolling_fingerprint(
    text_col: Column, base: int = 257, mod: int = 2_147_483_647
) -> Column:
    """Karp-Rabin polynomial fingerprint over the token stream.

    Ordered fold h ← (h·base + hash(tokenᵢ)) mod m, token hash = first 32
    md5 bits. Order-sensitive where ``fingerprint`` is stream-exact:
    prefix hashes of a sliding variant extend it to substring matching.
    Int64-safe (m·base + 2³² ≪ 2⁶³) and replayable as DuckDB
    ``list_reduce`` for the oracle."""
    return rolling_fingerprint_from(tokens(text_col), base=base, mod=mod)


def rolling_fingerprint_from(
    toks: Column, base: int = 257, mod: int = 2_147_483_647
) -> Column:
    """`rolling_fingerprint` from a staged token-array column (r13 opt)."""
    th = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(base) + x) % F.lit(mod),
    )


def with_text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """One projection adding the full text-analysis block (staged: the
    token array is computed once and shared — see the *_from helpers)."""
    c = F.col(text)
    t = F.col("__t")
    return (
        df.withColumn("__t", tokens(c))
        .withColumn("n_tokens", F.size(t))
        .withColumn("punct_ratio", F.round(punct_ratio(c), 4))
        .withColumn("stopword_ratio", F.round(stopword_ratio_from(t), 4))
        .withColumn("quality", quality_score_from(c, t))
        .withColumn("lang_detected", detect_language_from(t))
        .withColumn("fingerprint", fingerprint_from(t))
        .drop("__t")
    )


# 1:1 typographic fold: curly quotes -> straight, en/em/horizontal-bar
# dashes -> '-', NBSP/narrow-NBSP -> space (single chars both sides, so
# translate() does it in one pass; the 1-to-3 ellipsis uses replace)
_FOLD_FROM = "‘’‚“”„–—―  "
_FOLD_TO = "'''\"\"\"---  "
# stripped outright: C0/C1 controls (minus tab/newline/CR) + zero-width/bidi.
# Escape-sequence SOURCE form (\xhh / \x{hhhh}) — interpreted identically by
# Java regex and RE2/DuckDB, and safe to embed verbatim in oracle SQL (no
# raw control bytes in any literal).
_STRIP_RE = (
    r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f"
    r"\x{200b}-\x{200f}\x{2060}\x{feff}]"
)


def clean_text(text_col: Column) -> Column:
    """C4/CCNet-style text normalization — the cleanup pass upstream of
    every curation gate: fold typographic quotes/dashes/NBSP to ASCII,
    expand the ellipsis, strip control and zero-width/bidi characters,
    collapse runs of spaces/tabs to one space and 3+ newlines to one
    paragraph break, drop spaces hugging a newline, trim. Pure
    translate/replace/regexp chain (whole-stage codegen); the oracle
    replays the same patterns as literal characters built in Python, so
    there is no engine-specific escape syntax to desync."""
    s = F.translate(text_col, _FOLD_FROM, _FOLD_TO)
    s = F.replace(s, F.lit("…"), F.lit("..."))
    s = F.regexp_replace(s, _STRIP_RE, "")
    s = F.regexp_replace(s, "[ \t]+", " ")
    s = F.regexp_replace(s, "\n{3,}", "\n\n")
    s = F.regexp_replace(s, " ?\n ?", "\n")
    return F.trim(s)


def blocklist_signals(
    text_col: Column, blocked: tuple[str, ...]
) -> dict[str, Column]:
    """C4-style bad-words gate signals (Raffel et al. 2020 drop any page
    containing a "List of Dirty, Naughty…" word; the block LIST here is
    caller-supplied, the MECHANISM is the operator): per document, the
    count of blocked-token occurrences, their share of all tokens, and
    the pass verdict (zero hits). Token-level exact matching on the
    canonical lowercase stream — substring false-positives ("class" vs
    "ass") can't happen. Pure JVM array expressions, map-only."""
    toks = tokens(text_col)
    blocked_arr = F.array(*[F.lit(b.lower()) for b in blocked])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(blocked_arr, t)))
    n = F.size(toks)
    return {
        "n_blocked": hits.cast("long"),
        "blocked_ratio": F.when(n > 0, F.round(hits / n, 6)).otherwise(F.lit(0.0)),
        "blocklist_pass": hits == 0,
    }
