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


def test_iter_warc_records_streaming_large_payload():
    """Payloads larger than the 64 KiB read chunk must arrive intact
    through the record-at-a-time stream reader."""
    import io

    from name_match_latest_spark.sources.warc import (
        _iter_warc_records,
        _warc_record,
    )
    from datetime import datetime

    big = bytes(range(256)) * 1024  # 256 KiB binary payload
    rec1 = _warc_record("response", "http://a/1", datetime(2024, 1, 1), big)
    rec2 = _warc_record(
        "response", "http://a/2", datetime(2024, 1, 1), b"tiny"
    )
    out = list(_iter_warc_records(io.BytesIO(rec1 + rec2)))
    assert len(out) == 2
    assert out[0][1] == big
    assert out[1][1] == b"tiny"


def test_iter_warc_records_truncated_final_payload():
    """EOF mid-payload yields the truncated record (buffer-parser
    contract) and stops."""
    import io

    from name_match_latest_spark.sources.warc import _iter_warc_records

    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 100\r\n\r\n"
        b"only-20-bytes-here!!"
    )
    out = list(_iter_warc_records(io.BytesIO(raw)))
    assert len(out) == 1
    assert out[0][1] == b"only-20-bytes-here!!"


def test_gz_archive_streams_incrementally(tmp_path):
    """A .gz archive parses identically through the streaming wrapper
    and chunked Arrow yields (many records > _PAGES_PER_CHUNK)."""
    from datetime import datetime

    from name_match_latest_spark.sources.warc import (
        _PAGES_PER_CHUNK,
        _parse_warc_records,
        write_warc,
    )

    n = _PAGES_PER_CHUNK + 50
    pages = [
        (
            f"http://ex.com/{i}",
            datetime(2024, 1, 1),
            f"<html><body>doc {i}</body></html>".encode(),
            "en",
        )
        for i in range(n)
    ]
    p = tmp_path / "big.warc.gz"
    assert write_warc(str(p), pages) == n
    got = list(_parse_warc_records(p.read_bytes()))
    assert len(got) == n
    assert all(h.get("warc-type") == "response" for h, _ in got)


def test_local_glob_prunes_content_column(spark, tmp_path):
    """Local/file: globs must read path-only: the binaryFile scan's
    ReadSchema should not include the content column (the whole point
    of the streaming-from-disk mode)."""
    from datetime import datetime

    from name_match_latest_spark.sources.warc import (
        read_warc_pages,
        write_warc,
    )

    p = tmp_path / "one.warc.gz"
    write_warc(
        str(p),
        [
            (
                "http://ex.com/a",
                datetime(2024, 1, 1),
                b"<html><body>Maria Santos was born on 1990-01-02.</body></html>",
                "en",
            )
        ],
    )
    df = read_warc_pages(spark, str(tmp_path / "*.warc.gz"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan.lower().split("readschema")[-1][:200]
    rows = df.collect()
    assert len(rows) == 1 and rows[0].url == "http://ex.com/a"
    assert b"Maria Santos" in bytes(rows[0].html)


def test_resync_after_understated_content_length():
    """A record whose Content-Length understates its payload by more
    than the scan window must not swallow the REST of the archive:
    the parser slides forward and resynchronizes on the next header."""
    import io

    from datetime import datetime

    from name_match_latest_spark.sources.warc import (
        _iter_warc_records,
        _warc_record,
    )

    # record 1 claims 10 bytes but carries ~2 MB of separator-free noise
    noise = bytes([65 + (i % 20) for i in range(2 * 1024 * 1024)])
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/1\r\nContent-Length: 10\r\n\r\n"
        + noise
    )
    good = _warc_record(
        "response", "http://good/2", datetime(2024, 1, 1), b"payload-two"
    )
    out = list(_iter_warc_records(io.BytesIO(bad + b"\r\n\r\n" + good)))
    uris = [h.get("warc-target-uri") for h, _ in out]
    assert "http://good/2" in uris
    assert out[-1][1] == b"payload-two"


def test_owning_gzip_closes_fileobj(tmp_path):
    """Path-mode streams must close the underlying descriptor when the
    gzip wrapper closes (GzipFile alone leaks caller-supplied
    fileobjs)."""
    from datetime import datetime

    from name_match_latest_spark.sources.warc import (
        _open_record_stream,
        write_warc,
    )

    p = tmp_path / "x.warc.gz"
    write_warc(
        str(p),
        [("http://e/1", datetime(2024, 1, 1), b"<html></html>", "en")],
    )
    s = _open_record_stream(str(p), None)
    inner = s._owned_fileobj
    s.close()
    assert inner.closed
