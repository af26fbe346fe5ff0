"""URL scalar helpers (F9, SURVEY §2.9).

``domain_of`` — crawl/check_resources.py:73-74 uses urlparse(url).netloc.
``F.parse_url(col, 'HOST')`` is the codegen'd equivalent; a regexp variant
is provided because the DuckDB oracle lacks parse_url and regexp semantics
are identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme:// then optional userinfo@ then capture the host up to the
# first / ? # or : (the port); RE2-portable (non-capturing group only)
DOMAIN_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
SCHEME_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"


def domain_of(url_col: Column, portable: bool = True) -> Column:
    """Hostname of a URL (userinfo and port excluded). ``portable=True``
    uses a regexp reproducible in ANSI SQL / DuckDB; otherwise the native
    ``parse_url`` (same result, marginally cheaper). Both forms return
    NULL for a string with no ``scheme://`` authority."""
    if portable:
        ext = F.regexp_extract(url_col, DOMAIN_REGEX, 1)
        return F.when(ext != "", ext)  # '' on no-match → NULL, as parse_url
    # try_: under ANSI mode plain parse_url RAISES on malformed input
    return F.try_parse_url(url_col, F.lit("HOST"))


# tracking params dropped during canonicalization (the industry-standard
# utm/click-id set). One alternation consuming a RUN of consecutive
# tracking params: per-key passes would miss adjacent ones (Java/RE2
# resume scanning after the consumed separator, so "?utm_a=1&utm_b=2"
# keeps utm_b under a single per-key pass).
_TRK = r"(?:utm_[a-z]+|gclid|fbclid|msclkid|ref|mc_eid)=[^&#]*"


def canonicalize_url(url_col: Column) -> Column:
    """Canonical form for URL-level dedup — the crawl-plane twin of content
    fingerprinting (two catalog rows pointing at one resource through
    tracking-param / fragment / case noise are the same resource):

    1. lowercase scheme+host (path stays case-sensitive per RFC 3986),
    2. drop the fragment,
    3. drop default ports (:80 http, :443 https),
    4. drop tracking params (utm_*, gclid, fbclid, msclkid, ref, mc_eid),
       keeping the others in original order,
    5. collapse a now-empty query ("?" remainder) and a bare trailing "/"
       on an empty path.

    Pure regexp chain — whole-stage codegen, exactly replayable in the
    DuckDB oracle (no lookaround, no backrefs in the patterns).
    """
    # 1: scheme+host lowercase (userinfo dropped — credentials are not
    # identity for dedup). Split: scheme://[user@]host[rest] — rebuild
    # with lowered first two groups. regexp_replace can't lower a
    # backref, so lower the whole prefix via concat of extracted pieces.
    scheme = F.lower(F.regexp_extract(url_col, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url_col, DOMAIN_REGEX, 1))
    rest = F.regexp_replace(
        url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*", ""
    )
    u = F.concat(scheme, F.lit("://"), host, rest)
    # 2: fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3: default ports (two rules per scheme — RE2 has no lookahead)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?])", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80$", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?])", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443$", r"$1")
    # 4: tracking params — a mid-query run hands its separator to the next
    # kept param; an end-of-query run (with its leading separator) drops
    u = F.regexp_replace(u, rf"([?&]){_TRK}(&{_TRK})*&", r"$1")
    u = F.regexp_replace(u, rf"[?&]{_TRK}(&{_TRK})*$", "")
    # 5: empty query, bare root slash
    u = F.regexp_replace(u, r"\?$", "")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    # scheme-less / non-hierarchical strings pass through untouched — the
    # concat rebuild above would otherwise mangle them into '://' + url
    return F.when(url_col.rlike(SCHEME_REGEX), u).otherwise(url_col)
