"""WARC/WET reader: spec-constructed byte fixtures, no warcio anywhere."""

from __future__ import annotations

import gzip

import pytest

from udata_datalake_service_spark.sources.warc import (
    gunzip_members,
    iter_warc_records,
    read_warc,
    split_http_payload,
    write_warc,
)


def _resp(uri: str, body: bytes, status: int = 200) -> tuple[dict, bytes]:
    payload = (
        f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n".encode() + body
    )
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{uri}>",
            "WARC-Target-URI": uri,
            "WARC-Date": "2026-01-01T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        payload,
    )


def _fixture_records():
    return [
        ({"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
         b"software: test\r\n"),
        ({"WARC-Type": "request", "WARC-Target-URI": "http://a/"},
         b"GET / HTTP/1.1\r\nHost: a\r\n\r\n"),
        _resp("http://a/", b"<html><body><p>hello</p></body></html>"),
        # payload that CONTAINS the record delimiter text: a length-driven
        # parser must not split here
        _resp("http://b/", b"about WARC/1.0\r\n\r\nWARC/1.0 inline"),
        ({"WARC-Type": "conversion", "WARC-Target-URI": "http://c/",
          "Content-Type": "text/plain"}, b"wet extracted text"),
    ]


def test_roundtrip_plain_and_gzip():
    recs = _fixture_records()
    for gz in (False, True):
        data = write_warc(recs, gzip_members=gz)
        back = list(iter_warc_records(data))
        assert len(back) == 5
        assert [h["warc-type"] for h, _ in back] == [
            "warcinfo", "request", "response", "response", "conversion",
        ]
        # length-driven framing: the delimiter-alike payload survives intact
        _, p = back[3]
        assert b"WARC/1.0 inline" in p
        _, wet = back[4]
        assert wet == b"wet extracted text"


def test_gunzip_members_multi():
    a = gzip.compress(b"one"), gzip.compress(b"two")
    assert gunzip_members(a[0] + a[1]) == b"onetwo"
    with pytest.raises(ValueError, match="truncated"):
        gunzip_members(a[0][:-4])
    with pytest.raises(ValueError, match="trailing"):
        gunzip_members(a[0] + b"junk")


def test_http_split():
    status, hdr, body = split_http_payload(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
        b"X-Folded: a\r\n  b\r\n\r\n<p>x</p>"
    )
    assert status == 404
    assert hdr["content-type"] == "text/html"
    assert hdr["x-folded"] == "a b"
    assert body == b"<p>x</p>"
    # WET conversion payloads are not HTTP messages
    status, hdr, body = split_http_payload(b"plain text")
    assert status is None and hdr == {} and body == b"plain text"


def test_malformed_framing_is_loud():
    good = write_warc([_resp("http://a/", b"x")])
    with pytest.raises(ValueError, match="truncated payload"):
        list(iter_warc_records(good[:-8]))
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"NOT-WARC\r\n\r\n"))
    # shrink Content-Length so the terminator check lands mid-payload
    n = len(b"HTTP/1.1 200 X\r\nContent-Type: text/html\r\n\r\nx")
    bad = good.replace(
        f"Content-Length: {n}".encode(), f"Content-Length: {n - 2}".encode()
    )
    assert bad != good
    with pytest.raises(ValueError, match="terminator"):
        list(iter_warc_records(bad))


def test_read_warc_distributed(spark, tmp_path):
    # two files — one plain, one per-record-gzip — exercising both codec
    # legs through the binaryFile + mapInPandas path
    (tmp_path / "a.warc").write_bytes(write_warc(_fixture_records()))
    (tmp_path / "b.warc.gz").write_bytes(
        write_warc([_resp("http://gz/", b"<p>gz body</p>", status=301)],
                   gzip_members=True)
    )
    df = read_warc(spark, str(tmp_path)).cache()
    try:
        assert df.count() == 6
        resp = {
            r["target_uri"]: r
            for r in df.filter("warc_type = 'response'").collect()
        }
        assert set(resp) == {"http://a/", "http://b/", "http://gz/"}
        assert resp["http://a/"]["http_status"] == 200
        assert resp["http://gz/"]["http_status"] == 301
        assert bytes(resp["http://a/"]["payload"]) == (
            b"<html><body><p>hello</p></body></html>"
        )
        # conversion record payload is the raw extracted text
        wet = df.filter("warc_type = 'conversion'").collect()[0]
        assert bytes(wet["payload"]) == b"wet extracted text"
        assert wet["http_status"] is None
        # record_seq preserves in-file order for reproducible ids
        seqs = [r["record_seq"] for r in df.filter(
            "warc_file like '%a.warc'").orderBy("record_seq").collect()]
        assert seqs == [0, 1, 2, 3, 4]
    finally:
        df.unpersist()


def test_streaming_yields_before_exhausting_input():
    """Round-7 memory contract: the parser is a true stream. Feed one
    chunk per record through a counting iterator and require the first
    record OUT before the last chunk is pulled IN — i.e. peak buffer is
    O(record), not O(file)."""
    from udata_datalake_service_spark.sources.warc import write_warc

    n = 50
    recs = [_resp(f"http://site/{i}", b"x" * 4096) for i in range(n)]

    # plain path: one uncompressed record per chunk
    pulled: list[int] = []

    def plain_chunks():
        for i, r in enumerate(recs):
            pulled.append(i)
            yield write_warc([r])

    gen = iter_warc_records(plain_chunks())
    first = next(gen)
    assert first[0]["warc-target-uri"] == "http://site/0"
    assert len(pulled) < n, "parser consumed every chunk before yielding"
    assert list(gen)  # and the rest still parses cleanly

    # gzip path: one gzip member per chunk (the CommonCrawl layout)
    pulled.clear()

    def gz_chunks():
        for i, r in enumerate(recs):
            pulled.append(i)
            yield write_warc([r], gzip_members=True)

    gen = iter_warc_records(gz_chunks())
    first = next(gen)
    assert first[0]["warc-target-uri"] == "http://site/0"
    assert len(pulled) < n
    assert len(list(gen)) == n - 1


def test_inflate_stream_bounded_chunks():
    """_inflate_stream caps every output burst at 1 MiB even when a
    single member inflates far larger (zlib max_length), so a
    pathological member cannot blow task memory through one burst."""
    from udata_datalake_service_spark.sources.warc import _CHUNK, _inflate_stream

    big = b"a" * (5 * _CHUNK)  # highly compressible: one small member
    data = gzip.compress(big)
    out = []
    for chunk in _inflate_stream(data):
        assert len(chunk) <= _CHUNK
        out.append(chunk)
    assert b"".join(out) == big
    assert len(out) >= 5  # it really was released in bounded bursts


def test_inflate_stream_empty_and_errors():
    from udata_datalake_service_spark.sources.warc import _inflate_stream

    assert list(_inflate_stream(b"")) == []
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(_inflate_stream(gzip.compress(b"abc")[:-4]))
    with pytest.raises(ValueError, match="trailing non-gzip"):
        list(_inflate_stream(gzip.compress(b"abc") + b"junk"))


def test_inflate_stream_member_boundary_then_short_chunk():
    """ADVICE r7: a member ending exactly at a chunk boundary followed
    by a 1-byte chunk must NOT be rejected as trailing garbage — the
    fresh leftover has to re-enter the magic-straddle accumulation loop
    before the 2-byte gzip magic check."""
    from udata_datalake_service_spark.sources.warc import _inflate_stream

    m1 = gzip.compress(b"first member")
    m2 = gzip.compress(b"second member")
    # exact reproduction from the advice: [m1, m2[:1], m2[1:]]
    got = b"".join(_inflate_stream(iter([m1, m2[:1], m2[1:]])))
    assert got == b"first membersecond member"
    # every 1-byte chunking (the most hostile alignment) agrees too
    got = b"".join(_inflate_stream(iter(bytes([b]) for b in m1 + m2)))
    assert got == b"first membersecond member"
    # and a genuinely-trailing single junk byte is still loud
    with pytest.raises(ValueError, match="trailing non-gzip"):
        list(_inflate_stream(iter([m1, b"j"])))


def test_split_http_payload_lf_only_headers():
    """ADVICE r6: LF-only (and mixed) HTTP line endings appear in real
    crawls; the split must still strip the transport envelope."""
    status, hdr, body = split_http_payload(
        b"HTTP/1.1 200 OK\nContent-Type: text/html\nX-A: b\n\n<html>hi</html>"
    )
    assert status == 200
    assert hdr["content-type"] == "text/html"
    assert body == b"<html>hi</html>"

    # mixed endings: CRLF status line, LF header, LF-LF blank
    status, hdr, body = split_http_payload(
        b"HTTP/1.1 301 Moved\r\nLocation: http://x/\n\nbody"
    )
    assert status == 301
    assert hdr["location"] == "http://x/"
    assert body == b"body"


def test_chunk_boundary_invariance_property():
    """Hypothesis law: however the input byte stream is chunked —
    including chunks that split a record header, a Content-Length body,
    a gzip member, or the record terminator — the parsed (headers,
    payload) sequence is identical to the whole-bytes parse. This is the
    streaming parser's core invariant; a boundary bug here silently
    corrupts records at scale."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    recs = [
        _resp(f"http://x/{i}", bytes([i % 251]) * (17 * i % 300 + 1))
        for i in range(12)
    ]
    from udata_datalake_service_spark.sources.warc import write_warc

    plain = write_warc(recs)
    gz = write_warc(recs, gzip_members=True)
    want_plain = list(iter_warc_records(plain))
    want_gz = list(iter_warc_records(gz))
    assert want_plain == want_gz and len(want_plain) == 12

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def law(data):
        for blob, want in ((plain, want_plain), (gz, want_gz)):
            n_cuts = data.draw(st.integers(min_value=0, max_value=12))
            cuts = sorted(
                data.draw(
                    st.lists(
                        st.integers(min_value=1, max_value=len(blob) - 1),
                        min_size=n_cuts,
                        max_size=n_cuts,
                    )
                )
            )
            bounds = [0, *cuts, len(blob)]
            chunks = [blob[a:b] for a, b in zip(bounds, bounds[1:])]
            assert list(iter_warc_records(iter(chunks))) == want

    law()
