"""webcli end-to-end: WARC -> clusters parquet in each mode."""

from __future__ import annotations

import os


def _write_warc_input(spark, tmp_path, n=80, seed=29):
    from name_match_latest_spark.sources.warc import write_warc
    from name_match_latest_spark.sources.web import generate_webpages

    pages = generate_webpages(spark, n, seed=seed).localCheckpoint()
    rows = pages.collect()
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    write_warc(
        str(wdir / "a.warc.gz"),
        [(r.url, r.warc_ts, bytes(r.html), r.lang) for r in rows],
    )
    return pages, str(wdir)


def test_webcli_batch_mode(spark, tmp_path):
    from name_match_latest_spark import webcli
    from name_match_latest_spark.plans.web_pipeline import cluster_pages

    pages, wdir = _write_warc_input(spark, tmp_path)
    out = str(tmp_path / "out")
    assert webcli.run([os.path.join(wdir, "*.warc.gz"), out]) == 0
    got = spark.read.parquet(out)
    assert got.count() == cluster_pages(pages).count()
    assert set(got.columns) == {"id", "url", "mention_idx", "cluster_id"}


def test_webcli_resumable_mode(spark, tmp_path):
    from name_match_latest_spark import webcli

    pages, wdir = _write_warc_input(spark, tmp_path, n=60, seed=33)
    out = str(tmp_path / "out_r")
    assert (
        webcli.run(
            [os.path.join(wdir, "*.warc.gz"), out, "--resumable", "--groups", "4"]
        )
        == 0
    )
    audit = os.listdir(os.path.join(out, "audit"))
    assert len([f for f in audit if f.startswith("group-")]) == 4
    assert spark.read.parquet(os.path.join(out, "clusters")).count() > 0


def test_webcli_stream_mode(spark, tmp_path):
    from name_match_latest_spark import webcli
    from name_match_latest_spark.plans.web_pipeline import cluster_pages

    pages, wdir = _write_warc_input(spark, tmp_path, n=70, seed=37)
    out = str(tmp_path / "out_s")
    state = str(tmp_path / "state")
    assert webcli.run([wdir, out, "--stream-state", state]) == 0
    got = spark.read.parquet(out)
    assert got.count() == cluster_pages(pages).count()


def test_stream_mode_empty_watched_dir(spark, tmp_path):
    """Zero micro-batches (no WARC files dropped yet) must produce an
    empty members output, not crash on a missing mentions snapshot."""
    import os

    from name_match_latest_spark import webcli

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    assert webcli.run([str(src), out, "--stream-state", state]) == 0
    assert spark.read.parquet(out).count() == 0
