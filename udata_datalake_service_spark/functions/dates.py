"""Multi-format date/datetime parsing (F4, SURVEY §2.9).

Reference: analysis/helpers.py:13-27 — dateutil strict parse, then a
``dateparser`` NLP fallback that handles verbal dates in French/English
("31 décembre 2022", "31st december 2022"); golden tests at
tests/test_analysis/test_analysis_csv.py:126-168.

Spark-first design: a ``coalesce`` chain of ``try_to_timestamp`` patterns
covers the overwhelmingly common machine formats JVM-side; only rows that
fail every pattern reach the Arrow-batched pandas UDF fallback, which
handles month names in French/English/Spanish/German without external
deps (``dateparser`` isn't in this container — the verbal path is
implemented with explicit month tables, deterministic and tested).
"""

from __future__ import annotations

import re
from datetime import datetime

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

# Ordered like dateutil's tolerant parse: ISO first, then common EU/US.
# NOTE: the huge-digit guard in parse_datetime_multi exempts exactly the
# 5+-digit runs these patterns can legally produce (fractional seconds,
# bare yyyyMMdd). Adding a pattern with another long digit run (epoch
# seconds, yyyyMMddHHmmss) requires widening the guard — the guard-sync
# test (test_every_pattern_sample_survives_huge_digit_guard) enforces a
# sample per pattern so a desync fails loudly.
_DATE_PATTERNS = (
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "dd/MM/yyyy",
    "dd-MM-yyyy",
    "dd.MM.yyyy",
    "yyyyMMdd",
)
_DATETIME_PATTERNS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
)

_MONTHS = {
    # French (accented + unaccented), English, Spanish, German + common
    # abbreviations — the languages LANG_MARKERS advertises (the reference
    # rides dateparser's locale tables, analysis/helpers.py:13-27)
    "janvier": 1, "janv": 1, "jan": 1, "january": 1,
    "enero": 1, "ene": 1, "januar": 1, "jänner": 1, "jaenner": 1,
    "fevrier": 2, "février": 2, "fevr": 2, "fev": 2, "feb": 2, "february": 2,
    "febrero": 2, "februar": 2,
    "mars": 3, "mar": 3, "march": 3, "marzo": 3, "märz": 3, "maerz": 3, "mär": 3,
    "avril": 4, "avr": 4, "apr": 4, "april": 4, "abril": 4, "abr": 4,
    "mai": 5, "may": 5, "mayo": 5,
    "juin": 6, "jun": 6, "june": 6, "junio": 6, "juni": 6,
    "juillet": 7, "juil": 7, "jul": 7, "july": 7, "julio": 7, "juli": 7,
    "aout": 8, "août": 8, "aug": 8, "august": 8, "agosto": 8, "ago": 8,
    "septembre": 9, "sept": 9, "sep": 9, "september": 9,
    "septiembre": 9, "setiembre": 9,
    "octobre": 10, "oct": 10, "october": 10, "octubre": 10, "oktober": 10, "okt": 10,
    "novembre": 11, "nov": 11, "november": 11, "noviembre": 11,
    "decembre": 12, "décembre": 12, "dec": 12, "déc": 12, "december": 12,
    "diciembre": 12, "dic": 12, "dezember": 12, "dez": 12,
}

# [^\W\d_] = any unicode letter: covers é/û/ô (fr), ñ/á (es), ä/ö/ü/ß (de).
# Day connectors: "le 31 décembre", "el 31 de diciembre de", "31. Dezember".
_VERBAL_RE = re.compile(
    r"^\s*(?:le\s+|el\s+)?(\d{1,2})(?:st|nd|rd|th|er|e|º)?\.?\s+(?:de\s+)?"
    r"([^\W\d_]+)\.?\s+(?:de\s+|del\s+)?(\d{4})\s*$"
)
_MONTH_FIRST_RE = re.compile(
    r"^\s*([^\W\d_]+)\.?\s+(\d{1,2})(?:st|nd|rd|th)?,?\s+(\d{4})\s*$"
)


def _parse_verbal_one(s: str) -> datetime | None:
    if s is None:
        return None
    m = _VERBAL_RE.match(s)
    if m:
        day, month_name, year = m.group(1), m.group(2).lower(), m.group(3)
    else:
        m = _MONTH_FIRST_RE.match(s)
        if not m:
            return None
        month_name, day, year = m.group(1).lower(), m.group(2), m.group(3)
    month = _MONTHS.get(month_name)
    if month is None:
        return None
    try:
        return datetime(int(year), month, int(day))
    except ValueError:
        return None


@F.pandas_udf(TimestampType())
def _verbal_date_udf(s: pd.Series) -> pd.Series:
    # Arrow-batched. Real CSV columns repeat values heavily, so parse each
    # distinct string once per batch and broadcast via map (regex cost
    # becomes O(uniques), the common case for date columns).
    mapping = {v: _parse_verbal_one(v) for v in s.dropna().unique()}
    # explicit object dtype: an all-None batch must not collapse to float64
    # NaN (Arrow can't cast double → timestamp)
    return pd.Series([mapping.get(v) for v in s], index=s.index, dtype=object)


def _chain(col: Column, patterns: tuple[str, ...]) -> Column:
    parsed = [F.try_to_timestamp(col, F.lit(p)) for p in patterns]
    return F.coalesce(*parsed)


def parse_datetime_multi(col: Column, verbal_fallback: bool = True) -> Column:
    """Timestamp from the pattern chain, verbal-date UDF as last coalesce arm.

    Two measured pitfalls shape this:

    - The chains are dispatched on a cheap ``\\d:\\d`` probe instead of
      coalescing all 14 patterns: a date-only string can never match a
      datetime pattern (Spark requires full-string matches), so each row
      pays only its own family's chain (~2× less ``try_to_timestamp``
      work).
    - The UDF input is NOT masked by ``fast.isNull()``: Spark extracts the
      pandas UDF into an ArrowEvalPython node *below* the projection, and
      there is no common-subexpression elimination across that boundary —
      a mask referencing the chain re-evaluates the whole chain a second
      time (measured 9 s vs 3 s on 100 k rows). The verbal regex rejects
      machine-format strings in sub-µs, so unmasked input is cheaper.
    """
    # Guard: Spark's try_to_timestamp catches parse errors but NOT the
    # java.lang.ArithmeticException thrown by Iso8601TimestampFormatter
    # .extractMicros for absurd years — a greedy yyyy can swallow a 12+
    # digit integer string ("797210530501") and abort the whole job
    # (hypothesis-found, pinned in tests/test_properties.py). No valid
    # match of any pattern above contains a run of 5+ digits except the
    # fractional seconds (dot-prefixed) and the bare 8-digit yyyyMMdd
    # form, so strings with any other 5+ digit run short-circuit to NULL
    # before reaching the JVM formatter.
    huge_digits = col.rlike(r"(?<![0-9.])[0-9]{5,}") & ~col.rlike(
        r"^\s*[0-9]{8}\s*$"
    )
    has_time = col.rlike(r"\d:\d")
    fast = F.when(
        ~huge_digits,
        F.when(has_time, _chain(col, _DATETIME_PATTERNS)).otherwise(
            _chain(col, _DATE_PATTERNS)
        ),
    )
    if not verbal_fallback:
        return fast
    return F.coalesce(fast, _verbal_date_udf(col))


def parse_date_multi(col: Column, verbal_fallback: bool = True) -> Column:
    return parse_datetime_multi(col, verbal_fallback).cast("date")


_MONTH_ALT = "|".join(sorted(_MONTHS, key=len, reverse=True))
_DAY = r"(?:0?[1-9]|[12][0-9]|3[01])"


def verbal_date_rlike(col: Column) -> Column:
    """JVM-side would-a-verbal-date-parse indicator (no UDF).

    Used by the type-inference vote, where routing every cell through the
    ArrowEvalPython fallback costs seconds of per-query overhead for a
    yes/no answer. Matches the same day/month-name/year shapes as
    ``_parse_verbal_one``; day validity is approximated as 1–31 (a
    "30 février" votes yes here but still casts to NULL — the reference's
    sampling-based csv_detective has the same class of drift).
    """
    # (?iu): UNICODE_CASE so "MÄRZ"/"Décembre" fold like Python's re does
    day_first = (
        rf"(?iu)^\s*(?:le\s+|el\s+)?{_DAY}(?:st|nd|rd|th|er|e|º)?\.?\s+(?:de\s+)?"
        rf"(?:{_MONTH_ALT})\.?\s+(?:de\s+|del\s+)?\d{{4}}\s*$"
    )
    month_first = rf"(?iu)^\s*(?:{_MONTH_ALT})\.?\s+{_DAY}(?:st|nd|rd|th)?,?\s+\d{{4}}\s*$"
    return col.rlike(day_first) | col.rlike(month_first)
