"""HTML → text extraction: the raw-crawl-to-corpus boundary stage.

Every pretraining pipeline starts with markup (WET extraction /
trafilatura / resiliparse); this is the Spark-native regexp tier of that
stage — pure column expressions (whole-stage codegen, zero Python in the
row path), every pattern RE2-portable (no lookaround/backrefs) so the
DuckDB oracle replays it verbatim. A model-based main-content extractor
slots behind the same column contract as a pandas UDF where DOM-level
boilerplate removal is warranted; the signals (link density, text/html
ratio) are the classic boilerplate features either way.

Scale: map-only — an HTML extraction pass over 100 TB runs at parquet
scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strip-wholesale containers (content is never prose) + comments
_DROP_BLOCKS = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
# block-level closers/voids whose boundary should survive as a newline
_BLOCK_BREAK = r"(?i)</(?:p|div|li|tr|h[1-6]|ul|ol|table|blockquote)>|<br\b[^>]*/?>"
_ANY_TAG = r"(?s)<[^>]*>"

# minimal entity set, decoded in an order that can't double-decode
# (&amp; strictly last)
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_to_text(html_col: Column) -> Column:
    """Visible text from an HTML payload: drop script/style/comments,
    turn block boundaries into newlines, strip remaining tags, decode the
    common entities, collapse whitespace."""
    s = html_col
    for pat in _DROP_BLOCKS:
        s = F.regexp_replace(s, pat, " ")
    s = F.regexp_replace(s, _BLOCK_BREAK, "\n")
    s = F.regexp_replace(s, _ANY_TAG, " ")
    for ent, repl in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(repl))
    s = F.regexp_replace(s, r"[ \t]+", " ")
    s = F.regexp_replace(s, r" ?\n[ \n]*", "\n")
    return F.trim(s)


def html_signals(html_col: Column) -> dict[str, Column]:
    """Boilerplate features computed on the raw markup: anchor count,
    total tag count, and the extracted-text / raw-html length ratio (low
    ratio = chrome-heavy page — the first-order boilerplate signal)."""
    text = html_to_text(html_col)
    n_html = F.length(html_col)
    return {
        "n_links": F.regexp_count(html_col, F.lit(r"(?i)<a\b")),
        "n_tags": F.regexp_count(html_col, F.lit(_ANY_TAG)),
        "text_ratio": F.when(
            n_html > 0, F.round(F.length(text) / n_html, 6)
        ).otherwise(F.lit(0.0)),
    }
