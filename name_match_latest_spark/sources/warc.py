"""WARC / WET crawl ingestion — the formats a real Common-Crawl job reads.

A Common-Crawl segment is ~100k independent files of ~1 GB; production
Spark jobs parallelize at FILE granularity (each WARC is a stream of
length-prefixed records and is not block-splittable once gzipped).
This source follows that model exactly:

    spark.read.format("binaryFile") -> one row per WARC file
      -> mapInPandas record parser (Arrow-batched, pure stdlib)
      -> pages(url, warc_ts, html, text, lang)  [north-rule shape]

* ``read_warc_pages``  — WARC `response` records: strips the HTTP
  envelope, keeps raw html BYTES (byte-identical payloads), extracts
  text with the frozen extractor, assigns lang via header or the
  stopword heuristic.
* ``read_wet_pages``   — WET `conversion` records (pre-extracted
  text): text payload only, html NULL.
* ``read_jsonl_pages`` — newline-JSON crawl dumps (url, ts,
  html_base64, lang?): `spark.read.json` with an explicit schema (no
  sampling pass), html via unbase64 — all JVM-side.
* ``write_warc`` / ``write_wet`` — stdlib writers (gzip optional)
  used for fixtures and as the archival sink.

Scale notes: parallelism is at FILE granularity and the parse is a
narrow map with no shuffle; downstream repartitioning happens on the
pages DataFrame where rows are page-sized.  Worker memory is
O(record): records stream record-at-a-time through an incremental
gzip reader (multi-member streams — the Common-Crawl convention — are
native to GzipFile), pages are emitted in bounded Arrow chunks, and
for local/file: globs the content column is pruned from the
binaryFile scan entirely so not even the compressed archive is
buffered.  A ~1 GB gzipped WARC (~3-5 GB decompressed) therefore
costs one record + one chunk of pages per worker, not gigabytes.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .web import extract_text_from_html

__all__ = [
    "WARC_PAGE_SCHEMA",
    "read_warc_pages",
    "read_wet_pages",
    "stream_warc_pages",
    "read_jsonl_pages",
    "write_warc",
    "write_wet",
]

WARC_PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# record-level parse (pure functions — unit-testable without Spark)
# ---------------------------------------------------------------------------


#: header blocks larger than this are treated as unframed garbage —
#: bounds the scan-ahead buffer on corrupt input (real WARC header
#: blocks are a few hundred bytes)
_MAX_HEADER_BLOCK = 1 << 20


def _iter_warc_records(stream):
    """Yield (headers: dict, payload: bytes) per WARC record, reading
    the stream RECORD-AT-A-TIME — at no point is more than one
    record's payload (plus a bounded header buffer) in memory, so a
    ~1 GB gzipped archive (~3-5 GB decompressed) parses in O(record)
    memory instead of O(archive).

    WARC/1.0 framing: header block terminated by CRLF CRLF, payload of
    exactly Content-Length bytes, then CRLF CRLF before the next
    record.  Tolerates LF-only header framing, truncated final
    payloads, and trailing garbage (parse stops, matching the
    buffer parser's contract — property-tested in
    tests/test_warc_parser_properties.py).
    """
    buf = b""
    while True:
        # locate end of header block: earliest of CRLFCRLF / LFLF,
        # skipping leading inter-record CR/LF runs first
        while True:
            start = 0
            n = len(buf)
            while start < n and buf[start] in (0x0D, 0x0A):
                start += 1
            if start:
                buf = buf[start:]
            hdr_end = buf.find(b"\r\n\r\n")
            sep_len = 4
            lf_end = buf.find(b"\n\n")
            if hdr_end == -1 or (lf_end != -1 and lf_end < hdr_end):
                hdr_end, sep_len = lf_end, 2
            if hdr_end != -1:
                # the block may still END in CR/LF noise only — but a
                # found separator after the skip is a real block
                break
            if len(buf) > _MAX_HEADER_BLOCK:
                # unframed garbage run (e.g. a record whose
                # Content-Length understated its payload): keep
                # scanning for the NEXT record's header with a
                # bounded SLIDING window — the buffer parser this
                # replaced scanned ahead unboundedly and could
                # resynchronize, so giving up here would silently
                # drop every later record; memory stays O(window)
                buf = buf[-65536:]
            chunk = stream.read(65536)
            if not chunk:
                return  # EOF before a complete header block
            buf += chunk
        headers: dict[str, str] = {}
        for line in buf[:hdr_end].decode("utf-8", "replace").splitlines():
            if ":" in line:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
        body_start = hdr_end + sep_len
        try:
            length = int(headers.get("content-length", ""))
            if length < 0:
                raise ValueError
        except ValueError:
            # unframed/corrupt block (garbage run, negative or missing
            # Content-Length — e.g. the wake of a record that
            # understated its payload): skip past this block's
            # separator and keep scanning for the next real header —
            # returning here would silently drop every later record
            # in the archive.  Valid records are never rescanned this
            # way (their payloads are jumped by Content-Length).
            buf = buf[body_start:]
            continue
        payload = buf[body_start : body_start + length]
        buf = buf[body_start + length :]
        missing = length - len(payload)
        if missing > 0:
            rest = stream.read(missing)  # exact-length payload read
            payload += rest
        yield headers, payload


def _parse_warc_records(raw: bytes):
    """Buffer-input convenience wrapper over ``_iter_warc_records``.
    Gzip input (multi-member streams — Common Crawl gzips each record
    as its own member) is decompressed INCREMENTALLY via GzipFile, so
    even from an in-memory compressed buffer only one record's
    decompressed payload is held at a time."""
    if raw[:2] == b"\x1f\x8b":
        yield from _iter_warc_records(gzip.GzipFile(fileobj=io.BytesIO(raw)))
    else:
        yield from _iter_warc_records(io.BytesIO(raw))


def _strip_http_envelope(payload: bytes) -> bytes:
    """WARC response payloads embed the HTTP response; the body starts
    after the FIRST blank line — whichever framing (CRLF or bare LF)
    occurs earliest wins, because an LF-framed header followed by a
    body containing \\r\\n\\r\\n must not truncate the body."""
    if payload[:5] in (b"HTTP/", b"http/"):
        candidates = [
            (i, len(sep))
            for sep in (b"\r\n\r\n", b"\n\n")
            if (i := payload.find(sep)) != -1
        ]
        if candidates:
            i, sep_len = min(candidates)
            return payload[i + sep_len :]
    return payload


def _parse_warc_date(s: str | None):
    if not s:
        return None
    try:
        return (
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "was", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del"},
    "de": {"der", "die", "und", "das", "von", "ist", "den", "im"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "dans"},
    "tl": {"ang", "ng", "sa", "na", "ay", "mga", "si", "ito"},
}


def _guess_lang(text: str) -> str:
    """Stopword-hit argmax; ZERO hits keeps the "en" default (best
    starts at 0, and only a strictly positive score can displace it —
    starting at -1 would hand every stopword-free page to the first
    language alphabetically)."""
    toks = set(text.lower().split()[:400])
    best_lang, best = "en", 0
    for lang in sorted(_LANG_STOPWORDS):
        score = len(toks & _LANG_STOPWORDS[lang])
        if score > best:
            best_lang, best = lang, score
    return best_lang


# ---------------------------------------------------------------------------
# Spark readers
# ---------------------------------------------------------------------------


#: page rows per yielded Arrow batch — bounds worker memory to one
#: chunk of parsed pages instead of a whole archive's worth
_PAGES_PER_CHUNK = 256


def _local_path_of(uri: str) -> str | None:
    """file:-scheme (or bare) binaryFile path -> local fs path, else
    None (object-store URIs fall back to the content column)."""
    if uri.startswith("file:"):
        from urllib.parse import unquote, urlparse

        p = unquote(urlparse(uri).path)
        return p if os.path.exists(p) else None
    if "://" not in uri and os.path.exists(uri):
        return uri
    return None


class _OwningGzipFile(gzip.GzipFile):
    """GzipFile.close() never closes a caller-supplied fileobj; this
    variant owns it — without it, path-only reads of many archives
    leak one OS file descriptor each until GC (EMFILE on big globs)."""

    def __init__(self, fileobj):
        super().__init__(fileobj=fileobj)
        self._owned_fileobj = fileobj

    def close(self):
        try:
            super().close()
        finally:
            self._owned_fileobj.close()


def _open_record_stream(path_uri: str | None, content):
    """Best available record stream for one archive: stream straight
    from the local file when the path resolves (ZERO whole-file
    buffers — not even the compressed bytes), else incremental gzip
    over the in-memory content (compressed bytes held, decompressed
    stream O(record))."""
    local = _local_path_of(path_uri) if path_uri else None
    if local is not None:
        f = open(local, "rb")
        if f.read(2) == b"\x1f\x8b":
            f.seek(0)
            return _OwningGzipFile(f)
        f.seek(0)
        return f
    if content is None:
        raise FileNotFoundError(
            f"WARC path {path_uri!r} is not locally readable and the "
            "content column was pruned (path-only read of a non-local "
            "or vanished file)"
        )
    raw = bytes(content)
    if raw[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=io.BytesIO(raw))
    return io.BytesIO(raw)


def _read_records_as_pages(
    files: DataFrame, mode: str, path_only: bool = False
) -> DataFrame:
    """binaryFile rows -> page rows.  ``mode``: 'warc' (response
    records, html payload) or 'wet' (conversion records, text payload).

    Memory contract (the 1 GB-archive model): records stream
    record-at-a-time (``_iter_warc_records``) and parsed pages are
    yielded in ``_PAGES_PER_CHUNK`` Arrow batches, so a worker holds
    one record payload + one chunk of pages — never the decompressed
    archive.  ``path_only`` (set by the readers for local/file:
    globs) additionally PRUNES the content column from the binaryFile
    scan and streams straight off disk: not even the compressed
    archive is buffered."""
    has_path = "path" in files.columns
    cols = (
        ["path"]
        if path_only and has_path
        else (["path", "content"] if has_path else ["content"])
    )

    def parse(batches):
        for pdf in batches:
            paths = pdf["path"] if "path" in pdf else [None] * len(pdf)
            contents = (
                pdf["content"] if "content" in pdf else [None] * len(pdf)
            )
            for path_uri, content in zip(paths, contents):
                stream = _open_record_stream(path_uri, content)
                rows = []
                try:
                    for headers, payload in _iter_warc_records(stream):
                        rtype = headers.get("warc-type", "")
                        url = headers.get("warc-target-uri")
                        ts = _parse_warc_date(headers.get("warc-date"))
                        if mode == "warc" and rtype == "response":
                            html = _strip_http_envelope(payload)
                            text = extract_text_from_html(html)
                            lang = headers.get(
                                "warc-identified-content-language"
                            ) or _guess_lang(text)
                            rows.append(
                                (url, ts, html, text, lang.split(",")[0])
                            )
                        elif mode == "wet" and rtype == "conversion":
                            text = payload.decode("utf-8", "replace")
                            lang = headers.get(
                                "warc-identified-content-language"
                            ) or _guess_lang(text)
                            rows.append(
                                (url, ts, None, text, lang.split(",")[0])
                            )
                        if len(rows) >= _PAGES_PER_CHUNK:
                            yield pd.DataFrame(
                                rows,
                                columns=[
                                    "url", "warc_ts", "html", "text", "lang"
                                ],
                            )
                            rows = []
                finally:
                    stream.close()
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )

    return files.select(*cols).mapInPandas(parse, schema=WARC_PAGE_SCHEMA)


def _is_local_glob(path_glob: str) -> bool:
    """Local (or file:) globs can stream archives straight off disk —
    object-store schemes must travel through the content column."""
    return path_glob.startswith("file:") or "://" not in path_glob


def read_warc_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files (optionally .gz) -> north-rule pages table."""
    files = spark.read.format("binaryFile").load(path_glob)
    return _read_records_as_pages(
        files, "warc", path_only=_is_local_glob(path_glob)
    )


def read_wet_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET (extracted-text) files -> pages table with html = NULL."""
    files = spark.read.format("binaryFile").load(path_glob)
    return _read_records_as_pages(
        files, "wet", path_only=_is_local_glob(path_glob)
    )


def stream_warc_pages(spark: SparkSession, dir_path: str) -> DataFrame:
    """STREAMING pages from a watched directory of WARC files — the
    rolling-crawl front door: every archive dropped into ``dir_path``
    becomes a micro-batch of pages (binaryFile file-source semantics:
    each file is processed exactly once, tracked in the stream
    checkpoint).  The record split is the same stateless Arrow map as
    the batch reader, so it is legal on an unbounded stream; feed the
    result straight into ``IncrementalClusterer.attach``."""
    files = (
        spark.readStream.format("binaryFile")
        # the fixed binaryFile schema — streaming sources require it
        # explicitly (no inference pass on an unbounded directory)
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .load(dir_path)
    )
    return _read_records_as_pages(
        files, "warc", path_only=_is_local_glob(dir_path)
    )


JSONL_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", StringType(), True),
        StructField("html_base64", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def read_jsonl_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """Newline-JSON crawl dump -> pages table.  The schema is explicit
    (no inference pass over the data), html travels base64 and decodes
    JVM-side; text re-extraction stays the one frozen extractor."""
    raw = spark.read.schema(JSONL_SCHEMA).json(path_glob)
    with_html = raw.select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.unbase64("html_base64").alias("html"),
        "lang",
    )

    def add_text(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = [
                extract_text_from_html(bytes(h)) if h is not None else None
                for h in pdf["html"]
            ]
            yield pdf[["url", "warc_ts", "html", "text", "lang"]]

    return with_html.mapInPandas(add_text, schema=WARC_PAGE_SCHEMA)


# ---------------------------------------------------------------------------
# writers (fixtures + archival sink)
# ---------------------------------------------------------------------------


def _warc_record(rtype: str, url: str, ts: datetime, payload: bytes,
                 lang: str | None = None) -> bytes:
    rid = hashlib.md5(f"{url}|{ts}".encode()).hexdigest()
    headers = [
        b"WARC/1.0",
        f"WARC-Type: {rtype}".encode(),
        f"WARC-Target-URI: {url}".encode(),
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}".encode(),
        f"WARC-Record-ID: <urn:uuid:{rid}>".encode(),
    ]
    if lang:
        headers.append(f"WARC-Identified-Content-Language: {lang}".encode())
    headers.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def write_warc(path: str, pages, compress: bool | None = None) -> int:
    """Write (url, warc_ts, html_bytes, lang) tuples as WARC response
    records wrapped in a minimal HTTP envelope.  ``compress`` defaults
    from the filename (.gz).  Returns record count."""
    compress = path.endswith(".gz") if compress is None else compress
    buf = io.BytesIO()
    n = 0
    for url, ts, html, lang in pages:
        envelope = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        buf.write(_warc_record("response", url, ts, envelope, lang))
        n += 1
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return n


def write_wet(path: str, pages, compress: bool | None = None) -> int:
    """Write (url, warc_ts, text, lang) tuples as WET conversion
    records."""
    compress = path.endswith(".gz") if compress is None else compress
    buf = io.BytesIO()
    n = 0
    for url, ts, text, lang in pages:
        buf.write(
            _warc_record("conversion", url, ts, text.encode("utf-8"), lang)
        )
        n += 1
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return n
