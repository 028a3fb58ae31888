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

Scale notes: binaryFile streams each file as ONE row — fine for the
~1 GB WARC convention (Arrow batch = one file), and the parse is a
narrow map with no shuffle; downstream repartitioning happens on the
pages DataFrame where rows are page-sized.  Gzip is handled per file
(multi-member streams — Common Crawl gzips each record as its own
member precisely so whole-file decompression still works).
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


def _parse_warc_records(raw: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record.

    WARC/1.0 framing: header block terminated by CRLF CRLF, payload of
    exactly Content-Length bytes, then CRLF CRLF before the next
    record.  Tolerates LF-only header framing and trailing garbage.
    """
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # multi-member streams decompress fully
    pos, n = 0, len(raw)
    while pos < n:
        # skip inter-record CR/LF runs (payload bytes are never scanned
        # — the parser jumps over them by Content-Length)
        while pos < n and raw[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        sep_len = 4
        lf_end = raw.find(b"\n\n", pos)
        if hdr_end == -1 or (lf_end != -1 and lf_end < hdr_end):
            hdr_end, sep_len = lf_end, 2
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].decode("utf-8", "replace").splitlines():
            if ":" in line:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # unframed record: cannot recover record boundaries
        if length < 0:
            break  # corrupt length would move pos BACKWARDS (infinite
            # loop re-parsing the same header block)
        body_start = hdr_end + sep_len
        payload = raw[body_start : body_start + length]
        yield headers, payload
        pos = body_start + length


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


def _read_records_as_pages(files: DataFrame, mode: str) -> DataFrame:
    """binaryFile rows -> page rows.  ``mode``: 'warc' (response
    records, html payload) or 'wet' (conversion records, text payload)."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for headers, payload in _parse_warc_records(bytes(content)):
                    rtype = headers.get("warc-type", "")
                    url = headers.get("warc-target-uri")
                    ts = _parse_warc_date(headers.get("warc-date"))
                    if mode == "warc" and rtype == "response":
                        html = _strip_http_envelope(payload)
                        text = extract_text_from_html(html)
                        lang = headers.get(
                            "warc-identified-content-language"
                        ) or _guess_lang(text)
                        rows.append((url, ts, html, text, lang.split(",")[0]))
                    elif mode == "wet" and rtype == "conversion":
                        text = payload.decode("utf-8", "replace")
                        lang = headers.get(
                            "warc-identified-content-language"
                        ) or _guess_lang(text)
                        rows.append((url, ts, None, text, lang.split(",")[0]))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.select("content").mapInPandas(parse, schema=WARC_PAGE_SCHEMA)


def read_warc_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files (optionally .gz) -> north-rule pages table."""
    files = spark.read.format("binaryFile").load(path_glob)
    return _read_records_as_pages(files, "warc")


def read_wet_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET (extracted-text) files -> pages table with html = NULL."""
    files = spark.read.format("binaryFile").load(path_glob)
    return _read_records_as_pages(files, "wet")


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
    return _read_records_as_pages(files, "warc")


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
