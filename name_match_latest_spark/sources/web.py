"""Common-Crawl-style web-page table: generator, extractor, mention parser.

North-rule input shape (BASELINE.json input_hint):

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

* ``generate_webpages`` — deterministic seeded generator, DISTRIBUTED
  (spark.range -> mapInPandas): every page is a pure function of
  (page_id, seed), so any scale regenerates identically with no
  driver-side materialization.  Pages embed person mentions drawn from
  the same name pools / variant distributions as the person fixtures;
  each mention carries a known ground-truth entity id.
* ``extract_text_from_html`` — THE extractor whose output must be
  byte-identical per url (north rule; pytest-verified against golden
  fixtures in tests/fixtures/).  Pure function, no library deps.
* ``extract_mentions`` — Arrow-batched parse of extracted text into
  person-shaped mention rows with content-stable ids (xxhash64 of
  url + mention index — NOT monotonically_increasing_id, which is not
  stable across runs; csv_loader.rs:642-702 makes the same choice).
"""

from __future__ import annotations

import hashlib
import html as _htmlmod
import re
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "WEBPAGE_SCHEMA",
    "generate_webpages",
    "extract_text_from_html",
    "extract_mentions",
    "mentions_as_persons",
]

WEBPAGE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        # generator-only ground truth (dropped for the blind pipeline)
        StructField("true_entities", StringType(), True),
    ]
)

_DOMAINS = [
    "news.example.com", "blog.example.org", "people.example.net",
    "registry.example.io", "archive.example.gov", "wiki.example.edu",
]
_LANGS = ["en", "es", "tl", "de", "fr"]

_FIRST = [
    "maria", "jose", "juan", "ana", "cristina", "kristine", "john", "jon",
    "michael", "sarah", "alvaro", "sofia", "miguel", "isabel", "pedro",
    "carmen", "luis", "rosa", "paolo", "elena",
]
_LAST = [
    "santos", "delacruz", "reyes", "garcia", "smith", "smyth", "mendoza",
    "torres", "fernandez", "obrien", "ramos", "villanueva", "aquino",
    "castillo", "navarro", "domingo",
]
_FILLER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()

N_ENTITIES = 400  # ground-truth entity pool size


def _h(s: str) -> int:
    """Stable 64-bit hash (md5-derived) — the generator's only RNG."""
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def _entity(eid: int) -> tuple[str, str, str]:
    """Canonical (first, last, birthdate) for a ground-truth entity."""
    f = _FIRST[_h(f"e{eid}f") % len(_FIRST)]
    l = _LAST[_h(f"e{eid}l") % len(_LAST)]
    days = _h(f"e{eid}d") % 18000
    bd = (datetime(1950, 1, 1) + timedelta(days=days)).strftime("%Y-%m-%d")
    return f, l, bd


def _variant(eid: int, mention_key: str, name: str) -> str:
    """Deterministic edit-distance-1 variant ~35% of the time."""
    r = _h(f"v{eid}:{mention_key}") % 100
    if r < 65 or len(name) < 4:
        return name
    k = r % 3
    if k == 0:
        return name + "h"
    if k == 1:
        i = 1 + (r % (len(name) - 2))
        return name[:i] + name[i + 1:]
    i = 1 + (r % (len(name) - 2))
    return name[:i] + name[i + 1] + name[i] + name[i + 2:]


def _page_record(page_id: int, seed: int, n_entities: int = N_ENTITIES) -> tuple:
    key = f"{seed}:{page_id}"
    # entities are lang/domain-affine (a crawl mentions an entity mostly
    # on its home language and one of two home domains) so blocking keys
    # (soundex, lang, domain) actually co-locate same-entity mentions
    eid0 = _h(f"{key}:e0") % n_entities
    lang = _LANGS[eid0 % len(_LANGS)]
    domain = _DOMAINS[
        (_h(f"e{eid0}dom") + _h(key + "dd") % 2) % len(_DOMAINS)
    ]
    url = f"https://{domain}/{lang}/article/{page_id}"
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(
        seconds=_h(key + "ts") % (365 * 24 * 3600)
    )
    n_mentions = 1 + _h(key + "nm") % 4
    paras = []
    truths = []
    for m in range(n_mentions):
        eid = _h(f"{key}:e{m}") % n_entities
        f, l, bd = _entity(eid)
        # at most ONE field varies per mention — double-typo mentions are
        # (correctly) rejected by the cascade and would only blur the
        # ground-truth recall measurement
        fv = _variant(eid, f"{key}:{m}:f", f)
        lv = l if fv != f else _variant(eid, f"{key}:{m}:l", l)
        truths.append(str(eid))
        filler = " ".join(
            _FILLER[_h(f"{key}:{m}:w{w}") % len(_FILLER)] for w in range(6)
        )
        paras.append(f"Profile: {fv} {lv}, born {bd}. {filler}.")
    body = "\n".join(f"<p>{_htmlmod.escape(p)}</p>" for p in paras)
    html_doc = (
        f"<html><head><title>Page {page_id}</title>"
        f'<meta charset="utf-8"></head>\n'
        f"<body>\n<h1>Records &amp; notes</h1>\n{body}\n"
        f"<footer>crawled {ts.strftime('%Y-%m-%d')}</footer>\n</body></html>"
    )
    html_bytes = html_doc.encode("utf-8")
    text = extract_text_from_html(html_bytes)
    return (url, ts.replace(tzinfo=None), html_bytes, text, lang, ",".join(truths))


def generate_webpages(spark: SparkSession, n_pages: int, seed: int = 42,
                      partitions: int | None = None,
                      n_entities: int | None = None) -> DataFrame:
    """Deterministic distributed generation — page content is a pure
    function of (page_id, seed, n_entities) so the table is identical
    at any parallelism (the property the scaling bench relies on).
    ``n_entities`` defaults to ~n_pages/4 (bounded below by 400) so
    mentions-per-entity stays realistic as the corpus grows instead of
    forming ever-denser cliques."""
    ents = n_entities or max(N_ENTITIES, n_pages // 4)
    base = spark.range(0, n_pages, numPartitions=partitions or max(8, n_pages // 25000))

    def gen(batches):
        for pdf in batches:
            rows = [_page_record(int(i), seed, ents) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang", "true_entities"]
            )

    return base.mapInPandas(gen, schema=WEBPAGE_SCHEMA)


_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"[ \t]+")


def extract_text_from_html(html_bytes: bytes) -> str:
    """Byte-identical deterministic text extraction (north rule).

    Contract (frozen; golden fixtures in tests/fixtures/):
    1. drop everything inside <script>/<style> blocks (case-insensitive)
    2. strip all tags
    3. decode HTML entities
    4. collapse runs of spaces/tabs to one space; strip each line;
       drop empty lines; join with '\\n'
    """
    no_blocks = re.sub(
        rb"<(script|style)\b[^>]*>.*?</\1\s*>", b" ", html_bytes,
        flags=re.IGNORECASE | re.DOTALL,
    )
    no_tags = _TAG_RE.sub(b" ", no_blocks)
    decoded = _htmlmod.unescape(no_tags.decode("utf-8", errors="replace"))
    lines = []
    for line in decoded.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


MENTION_RE = re.compile(r"Profile: ([a-z]+) ([a-z]+), born (\d{4}-\d{2}-\d{2})\.")

MENTION_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("mention_idx", IntegerType(), False),
        StructField("first_name", StringType(), False),
        StructField("last_name", StringType(), False),
        StructField("bd_str", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("true_entity", LongType(), True),
    ]
)


def extract_mentions(pages: DataFrame, with_truth: bool = False) -> DataFrame:
    """Parse person mentions out of extracted text (Arrow-batched).
    Output ids are content-stable: xxhash64(url, mention_idx)."""
    has_truth = with_truth and "true_entities" in pages.columns
    cols = ["url", "text", "lang"] + (["true_entities"] if has_truth else [])
    src = pages.select(*cols)

    def parse(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                truths = (
                    row.true_entities.split(",") if has_truth and row.true_entities else []
                )
                for i, m in enumerate(MENTION_RE.finditer(row.text)):
                    t = int(truths[i]) if i < len(truths) else None
                    out.append(
                        (row.url, i, m.group(1), m.group(2), m.group(3), row.lang, t)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "mention_idx", "first_name", "last_name", "bd_str",
                    "lang", "true_entity",
                ],
            )

    return src.mapInPandas(parse, schema=MENTION_SCHEMA)


def mentions_as_persons(mentions: DataFrame) -> DataFrame:
    """Mention rows -> the person-table shape the matching core expects,
    with a stable content-derived id and the url domain as a blocking
    attribute."""
    return mentions.select(
        F.xxhash64("url", "mention_idx").alias("id"),
        F.col("url"),
        F.col("mention_idx"),
        F.col("first_name"),
        F.lit(None).cast("string").alias("middle_name"),
        F.col("last_name"),
        F.to_date("bd_str", "yyyy-MM-dd").alias("birthdate"),
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("domain"),
        F.col("lang"),
        F.col("true_entity"),
    )
