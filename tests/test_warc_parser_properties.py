"""Property tests for the pure WARC record framing (no Spark).

The parser must survive adversarial payloads: embedded CRLF CRLF
sequences, bytes that look like WARC headers, gzip, empty payloads —
because it jumps by Content-Length instead of scanning payload bytes.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from name_match_latest_spark.sources.warc import (
    _parse_warc_records,
    _strip_http_envelope,
    _warc_record,
)

_TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)

payloads = st.binary(min_size=0, max_size=400)
urls = st.from_regex(r"https://[a-z]{3,8}\.example\.com/[a-z0-9]{1,12}", fullmatch=True)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(urls, payloads), min_size=0, max_size=8), st.booleans())
def test_roundtrip_any_payload(records, compress):
    """write -> parse returns every record with exact payload bytes,
    even when payloads contain CRLF CRLF, 'WARC/1.0', or header-like
    lines."""
    raw = b"".join(
        _warc_record("response", url, _TS, p) for url, p in records
    )
    if compress:
        raw = gzip.compress(raw)
    got = list(_parse_warc_records(raw))
    assert len(got) == len(records)
    for (url, p), (headers, payload) in zip(records, got):
        assert headers["warc-target-uri"] == url
        assert payload == p


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_http_envelope_strip_preserves_body(body):
    env = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    assert _strip_http_envelope(env) == body
    # a payload that is NOT an HTTP message passes through untouched
    assert _strip_http_envelope(body) == body or body[:5] in (b"HTTP/", b"http/")


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_garbage_never_raises(garbage):
    """Arbitrary non-gzip garbage yields zero or more records, never
    an exception (crawl archives contain truncated tails)."""
    if garbage[:2] == b"\x1f\x8b":
        return  # gzip magic with corrupt body raises by design
    list(_parse_warc_records(garbage))


def test_negative_content_length_terminates():
    """A corrupt negative Content-Length must not loop forever."""
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.example/a\r\n"
        b"Content-Length: -1000\r\n\r\n" + b"Z" * 2000
    )
    assert list(_parse_warc_records(raw)) == []


def test_lf_framed_envelope_with_crlf_in_body():
    """LF-only HTTP headers + a body containing CRLF CRLF: the body
    must survive intact (earliest blank line wins)."""
    body = b"<html>a\r\n\r\nb</html>"
    env = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + body
    assert _strip_http_envelope(env) == body


def test_guess_lang_defaults_to_en_on_zero_hits():
    from name_match_latest_spark.sources.warc import _guess_lang

    assert _guess_lang("zzz qqq xxx nothing matches") == "en"
    assert _guess_lang("der und das von ist") == "de"
