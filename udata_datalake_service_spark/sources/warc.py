"""WARC / WET container ingestion — the raw-crawl boundary stage.

A pretraining pipeline's raw input is CommonCrawl WARC (ISO 28500) or its
WET (extracted-text conversion) sibling. This reader completes the
raw-crawl → curated-corpus path: WARC bytes → (record headers, payload)
rows → ``llm.html.html_to_text`` → ``functions.urls.url_quality_filter``
→ curation. The reference's ingestion boundary is the streamed HTTP
download (`/root/reference/udata_hydra/utils/file.py:34-75`, ported by
``plans/fetch.py``); this stage sits immediately upstream of it for
crawl-scale corpora, in the same from-scratch stdlib spirit as
``sources/biff.py`` (no warcio dependency).

Format (WARC/1.0, public spec):

* record = version line ``WARC/1.0\\r\\n``, header lines ``Name: value``
  (LWS continuation lines folded), blank line, exactly
  ``Content-Length`` payload bytes, then a ``\\r\\n\\r\\n`` terminator.
* Parsing is LENGTH-DRIVEN, never delimiter-driven: a payload containing
  the literal bytes ``WARC/1.0`` must not split a record (pinned by
  tests/test_warc.py).
* ``.warc.gz`` files are multi-member gzip (one member per record is the
  CommonCrawl convention); ``iter_warc_records`` sniffs the 0x1f8b magic
  and inflates members sequentially.

Scale: CommonCrawl ships ~1 GB .warc.gz files; per-record gzip members
make arbitrary byte-offset splits impossible without a sidecar index, so
the industry-standard unit of parallelism is the FILE (one task per
file — the same layout sparkcc and archives-unleashed use). ``read_warc``
therefore reads ``binaryFile`` rows (one per file) and explodes records
through an Arrow-batched ``mapInPandas``; at 100 TB that is ~100k files
→ ~100k tasks, comfortably above any executor count, with no shuffle —
record extraction runs at decompression speed and everything downstream
is ordinary column expressions.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


def gunzip_members(data: bytes) -> bytes:
    """Inflate a (possibly multi-member) gzip stream with zlib alone.

    CommonCrawl .warc.gz concatenates one gzip member per record;
    ``zlib.decompressobj(wbits=47)`` stops at each member boundary, so
    loop on ``unused_data`` until the stream is exhausted. Trailing
    garbage that is not a gzip member fails loudly (a truncated transfer
    should never silently drop records)."""
    out = io.BytesIO()
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=47)
        out.write(d.decompress(rest))
        out.write(d.flush())
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        rest = d.unused_data
        if rest and not rest.startswith(_GZIP_MAGIC):
            raise ValueError("warc: trailing non-gzip bytes after member")
    return out.getvalue()


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC (and HTTP/1.1) header block → dict; continuation lines
    (leading SP/HT) fold into the previous value per RFC 7230 §3.2.4;
    names are case-normalized to the spec's canonical hyphenated form
    via lower() keys."""
    headers: dict[str, str] = {}
    last: str | None = None
    for raw in block.split(_CRLF):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + raw.strip().decode("utf-8", "replace")
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            raise ValueError(f"warc: malformed header line {raw[:60]!r}")
        last = name.strip().decode("ascii", "replace").lower()
        headers[last] = value.strip().decode("utf-8", "replace")
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, payload)`` per record from raw WARC bytes
    (gzip-sniffed). Length-driven: after the header block, exactly
    ``Content-Length`` payload bytes are consumed, then the two-CRLF
    record terminator is required — malformed framing raises rather than
    resynchronizing (silent resync turns one corrupt record into an
    unbounded number of wrong ones)."""
    if data[:2] == _GZIP_MAGIC:
        data = gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra blank lines between records (some writers pad)
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.index(_CRLF, pos)
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"warc: expected version line, got {version[:30]!r}")
        head_end = data.index(_CRLF + _CRLF, eol)
        headers = _parse_headers(data[eol + 2 : head_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("warc: missing/invalid Content-Length") from e
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            raise ValueError("warc: truncated payload")
        if data[body_end : body_end + 4] != _CRLF + _CRLF and body_end != n:
            raise ValueError("warc: missing record terminator")
        yield headers, data[body_start:body_end]
        pos = body_end + 4


def split_http_payload(payload: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """A WARC 'response' payload is a full HTTP/1.1 message: status line,
    headers, blank line, body. Returns (status, headers, body); a payload
    that is not an HTTP message (e.g. a WET conversion record) comes back
    as (None, {}, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, {}, payload
    head = payload[:sep]
    status_line, _, header_block = head.partition(_CRLF)
    parts = status_line.split(b" ", 2)
    try:
        status: int | None = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, _parse_headers(header_block), payload[sep + 4 :]


WARC_RECORD_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_seq", LongType()),  # ordinal within the file
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),  # HTTP body for responses
    ]
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC/WET scan: one binaryFile row per file → one
    Arrow-batched record explosion per task. No shuffle; downstream
    filters on warc_type/http_status are ordinary column predicates.

    The returned ``payload`` is the HTTP BODY for response records (the
    transport envelope is already parsed into http_status /
    http_content_type) and the raw record block otherwise (WET
    'conversion' records are the extracted text itself)."""
    files = spark.read.format("binaryFile").load(path)

    def explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for seq, (hdr, body) in enumerate(iter_warc_records(bytes(content))):
                    status, http_hdr, http_body = split_http_payload(body)
                    rows.append(
                        {
                            "warc_file": fname,
                            "record_seq": seq,
                            "warc_type": hdr.get("warc-type"),
                            "record_id": hdr.get("warc-record-id"),
                            "target_uri": hdr.get("warc-target-uri"),
                            "warc_date": hdr.get("warc-date"),
                            "content_type": hdr.get("content-type"),
                            "content_length": int(hdr["content-length"]),
                            "http_status": status,
                            "http_content_type": http_hdr.get("content-type"),
                            "payload": http_body if status is not None else body,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(explode, WARC_RECORD_SCHEMA)


def write_warc(records: list[tuple[dict[str, str], bytes]], gzip_members: bool = False) -> bytes:
    """Render records to WARC/1.0 bytes (test-fixture + round-trip
    counterpart of ``iter_warc_records``; per-record gzip members when
    ``gzip_members`` — the CommonCrawl layout)."""
    out = io.BytesIO()
    for headers, payload in records:
        buf = io.BytesIO()
        buf.write(b"WARC/1.0\r\n")
        for k, v in headers.items():
            if k.lower() == "content-length":
                continue  # always recomputed from the payload
            buf.write(f"{k}: {v}\r\n".encode())
        buf.write(f"Content-Length: {len(payload)}\r\n".encode())
        buf.write(_CRLF)
        buf.write(payload)
        buf.write(_CRLF + _CRLF)
        member = buf.getvalue()
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            member = co.compress(member) + co.flush()
        out.write(member)
    return out.getvalue()
