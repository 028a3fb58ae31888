"""WARC/WET/JSONL crawl ingestion: roundtrip fidelity + pipeline compat.

The invariants that matter at crawl scale:
* html payload bytes survive the WARC envelope EXACTLY (the frozen
  extractor's byte-identical contract starts at the payload);
* gzip and plain files parse identically (Common Crawl ships .gz);
* the produced pages table feeds the match pipeline unchanged.
"""

from __future__ import annotations

import base64
import json
from datetime import datetime

import pytest


def _sample_pages(spark, n=40):
    from name_match_latest_spark.sources.web import generate_webpages

    rows = generate_webpages(spark, n, seed=9).collect()
    return [(r.url, r.warc_ts, bytes(r.html), r.lang) for r in rows], rows


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_warc_roundtrip_bytes_exact(spark, tmp_path, suffix):
    from name_match_latest_spark.sources.warc import read_warc_pages, write_warc

    pages, orig = _sample_pages(spark)
    # two files -> two binaryFile rows -> file-level parallelism
    mid = len(pages) // 2
    write_warc(str(tmp_path / f"a.{suffix}"), pages[:mid])
    write_warc(str(tmp_path / f"b.{suffix}"), pages[mid:])

    got = read_warc_pages(spark, str(tmp_path / f"*.{suffix}")).collect()
    assert len(got) == len(orig)
    by_url = {r.url: r for r in got}
    for r in orig:
        g = by_url[r.url]
        assert bytes(g.html) == bytes(r.html)  # byte-identical payload
        assert g.text == r.text  # extractor reproduces the text column
        assert g.lang == r.lang  # header-supplied lang wins
        assert g.warc_ts == r.warc_ts.replace(microsecond=0)


def test_wet_roundtrip_text(spark, tmp_path):
    from name_match_latest_spark.sources.warc import read_wet_pages, write_wet

    pages, orig = _sample_pages(spark, n=20)
    wet = [(r.url, r.warc_ts, r.text, r.lang) for r in orig]
    write_wet(str(tmp_path / "x.wet.gz"), wet)
    got = read_wet_pages(spark, str(tmp_path / "x.wet.gz")).collect()
    assert {r.url: r.text for r in got} == {r.url: r.text for r in orig}
    assert all(r.html is None for r in got)


def test_lang_guess_when_header_absent(spark, tmp_path):
    from name_match_latest_spark.sources.warc import read_warc_pages, write_warc

    html = (
        b"<html><body><p>the cat and the dog of the house is in the "
        b"garden for the winter and the spring</p></body></html>"
    )
    write_warc(
        str(tmp_path / "x.warc"),
        [("https://ex.com/a", datetime(2024, 1, 2, 3, 4, 5), html, None)],
    )
    got = read_warc_pages(spark, str(tmp_path / "x.warc")).collect()
    assert got[0].lang == "en"


def test_jsonl_pages(spark, tmp_path):
    from name_match_latest_spark.sources.warc import read_jsonl_pages

    pages, orig = _sample_pages(spark, n=15)
    path = tmp_path / "crawl.jsonl"
    with open(path, "w") as f:
        for url, ts, html, lang in pages:
            f.write(
                json.dumps(
                    {
                        "url": url,
                        "warc_ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
                        "html_base64": base64.b64encode(html).decode(),
                        "lang": lang,
                    }
                )
                + "\n"
            )
    got = read_jsonl_pages(spark, str(path)).collect()
    assert len(got) == len(orig)
    by_url = {r.url: r for r in got}
    for r in orig:
        g = by_url[r.url]
        assert bytes(g.html) == bytes(r.html)
        assert g.text == r.text


def test_warc_pages_feed_the_cluster_pipeline(spark, tmp_path):
    """End-to-end: WARC file -> pages -> clusters matches the
    direct-generated pipeline output (ids are content-stable)."""
    from name_match_latest_spark.plans.web_pipeline import cluster_pages
    from name_match_latest_spark.sources.warc import read_warc_pages, write_warc
    from name_match_latest_spark.sources.web import generate_webpages

    pages_df = generate_webpages(spark, 60, seed=21).localCheckpoint()
    rows = pages_df.collect()
    write_warc(
        str(tmp_path / "c.warc.gz"),
        [(r.url, r.warc_ts, bytes(r.html), r.lang) for r in rows],
    )

    from_warc = cluster_pages(
        read_warc_pages(spark, str(tmp_path / "c.warc.gz"))
    ).collect()
    direct = cluster_pages(pages_df).collect()
    assert sorted((r.id, r.cluster_id) for r in from_warc) == sorted(
        (r.id, r.cluster_id) for r in direct
    )
