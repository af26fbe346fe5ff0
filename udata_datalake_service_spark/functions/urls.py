"""URL scalar helpers (F9, SURVEY §2.9).

``domain_of`` — crawl/check_resources.py:73-74 uses urlparse(url).netloc.
``F.parse_url(col, 'HOST')`` is the codegen'd equivalent; a regexp variant
is provided because the DuckDB oracle lacks parse_url and regexp semantics
are identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme:// then capture everything up to the first / ? # or :
DOMAIN_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)"


def domain_of(url_col: Column, portable: bool = True) -> Column:
    """Hostname of a URL. ``portable=True`` uses a regexp reproducible in
    ANSI SQL / DuckDB; otherwise the native ``parse_url`` (same result,
    marginally cheaper)."""
    if portable:
        return F.regexp_extract(url_col, DOMAIN_REGEX, 1)
    return F.parse_url(url_col, F.lit("HOST"))
