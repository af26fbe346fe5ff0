"""S7 — MIME detection from content magic bytes (SURVEY §2.1).

Reference: ``magic.from_file(..., mime=True)`` (analysis/resource.py:92)
via libmagic, which inspects leading bytes. python-magic is not in this
container — and at scale a per-file driver call is wrong anyway — so this
is the Spark-native form: a pure column-expression cascade over the hex
prefix of a ``binary`` column, covering every signature the reference's
pipeline actually dispatches on (gzip / zip-xlsx / OLE-xls / pdf /
jpeg / png) plus a printable-text heuristic for the csv/plain family.
Runs inside whole-stage codegen over parquet-resident binaries; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hex prefix of leading bytes, mime) — order matters: longest/most
# specific first where prefixes could overlap.
MAGIC_SIGNATURES: tuple[tuple[str, str], ...] = (
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),  # xlsx/ods/docx are zip containers
    ("D0CF11E0A1B11AE1", "application/vnd.ms-excel"),  # OLE compound (xls)
    ("25504446", "application/pdf"),
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("474946383", "image/gif"),  # GIF87a/GIF89a
    ("494433", "audio/mpeg"),  # ID3
    ("52494646", "audio/x-wav"),  # RIFF (wav/avi; wav dominates open data)
)

# control bytes that never appear in text files (tab/newline/CR excluded)
_CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"


def detect_mime(content: Column, sniff_bytes: int = 64) -> Column:
    """binary column → mime string.

    Magic-signature cascade first; otherwise, if the leading bytes decode
    as control-character-free UTF-8, ``text/plain`` (what libmagic reports
    for CSV, which is exactly how the reference routes csv analysis);
    else ``application/octet-stream``.
    """
    head = F.substring(content, 1, sniff_bytes)
    hx = F.hex(F.substring(content, 1, 8))
    out = None
    for prefix, mime in MAGIC_SIGNATURES:
        cond = hx.startswith(prefix)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    # Spark 4 removed decode()'s replacement-char behavior — F.decode now
    # RAISES [MALFORMED_CHARACTER_CODING] on any invalid byte. Reinterpret
    # the bytes via cast (no validation) and repair with make_valid_utf8,
    # which substitutes U+FFFD per invalid sequence → rejected alongside
    # control bytes below. A multi-byte char cut at the sniff boundary
    # yields exactly one trailing U+FFFD (one incomplete trailing
    # sequence); tolerate that single trailing replacement ONLY when the
    # head was actually cut at sniff_bytes — i.e. the payload continues
    # past it; an exactly-sniff_bytes payload with a malformed tail is
    # genuinely malformed.
    txt = F.make_valid_utf8(head.cast("string"))
    truncated = F.octet_length(content) > sniff_bytes
    txt_body = F.when(
        truncated & txt.endswith("�"), txt.substr(F.lit(1), F.length(txt) - 1)
    ).otherwise(txt)
    is_text = ~txt_body.rlike(_CONTROL_RE) & ~txt_body.contains("�")
    cascade = out.when(is_text, "text/plain").otherwise("application/octet-stream")
    return F.when(content.isNull(), F.lit(None).cast("string")).otherwise(cascade)
