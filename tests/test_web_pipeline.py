"""North-rule web pipeline: byte-identical extraction, pairwise F1 vs
the reference-faithful oracle, clustering quality, checkpoint resume."""

from __future__ import annotations

import os

import pytest

from name_match_latest_spark.sources.web import (
    _page_record,
    extract_mentions,
    extract_text_from_html,
    generate_webpages,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


class TestExtractor:
    def test_golden_fixtures_byte_identical(self):
        """Extracted text per fixture page must be byte-identical to the
        committed golden files (north-rule invariant)."""
        names = sorted(
            n[:-5] for n in os.listdir(FIXDIR) if n.endswith(".html")
        )
        assert names, "no golden fixtures committed"
        for n in names:
            with open(os.path.join(FIXDIR, f"{n}.html"), "rb") as f:
                html = f.read()
            with open(os.path.join(FIXDIR, f"{n}.txt"), "rb") as f:
                expected = f.read()
            got = extract_text_from_html(html).encode("utf-8")
            assert got == expected, f"extractor drift on {n}"

    def test_deterministic_per_url(self):
        rec1 = _page_record(123, seed=42)
        rec2 = _page_record(123, seed=42)
        assert rec1 == rec2
        assert rec1[3] == extract_text_from_html(rec1[2])

    def test_script_style_dropped(self):
        html = b"<html><script>var x='<p>no</p>';</script><style>p{}</style><p>yes&amp;yes</p></html>"
        assert extract_text_from_html(html) == "yes&yes"


@pytest.fixture(scope="module")
def pages(spark):
    return generate_webpages(spark, 300, seed=42, partitions=4).cache()


class TestGenerator:
    def test_schema_and_counts(self, pages):
        assert pages.count() == 300
        cols = dict(pages.dtypes)
        assert cols["url"] == "string"
        assert cols["warc_ts"] == "timestamp"
        assert cols["html"] == "binary"
        assert cols["text"] == "string"
        assert cols["lang"] == "string"

    def test_parallelism_invariance(self, spark, pages):
        """Same seed at different partition counts -> identical table
        (the property the scaling bench depends on)."""
        alt = generate_webpages(spark, 300, seed=42, partitions=13)
        a = {r.url: r.text for r in pages.select("url", "text").collect()}
        b = {r.url: r.text for r in alt.select("url", "text").collect()}
        assert a == b

    def test_mentions_parse_back(self, spark, pages):
        m = extract_mentions(pages, with_truth=True)
        rows = m.collect()
        assert len(rows) >= 300  # 1-4 mentions per page
        assert all(r.true_entity is not None for r in rows)


class TestPipelineF1:
    def test_pairwise_decisions_match_oracle(self, spark, pages):
        """Engine decisions over candidate pairs == oracle cascade
        decisions (pairwise F1 vs reference semantics = 1.0)."""
        from name_match_latest_spark.functions.scoring import classify_no_mid
        from name_match_latest_spark.plans.web_pipeline import (
            match_mentions,
            prepare_mentions,
        )
        from pyspark.sql import functions as F

        prepared = prepare_mentions(pages, with_truth=True).cache()
        # all candidate pairs (pre-score): same block + bd equality
        from name_match_latest_spark.operators.blocking import pair_join
        from name_match_latest_spark.plans.web_pipeline import _block_key

        cand = (
            pair_join(prepared, prepared, lambda p: [_block_key(p)])
            .filter(F.col("t1_id") < F.col("t2_id"))
            .filter(F.col("t1_birthdate") == F.col("t2_birthdate"))
        )
        cand_rows = cand.select(
            "t1_id", "t2_id", "t1_first_name", "t1_last_name",
            "t2_first_name", "t2_last_name",
        ).collect()
        oracle = {}
        for r in cand_rows:
            res = classify_no_mid(
                r.t1_first_name, r.t1_last_name, r.t2_first_name, r.t2_last_name
            )
            if res is not None:
                oracle[(r.t1_id, r.t2_id)] = round(res[0] / 100.0, 9)

        engine = {
            (r.t1_id, r.t2_id): round(r.confidence, 9)
            for r in match_mentions(prepared).select(
                "t1_id", "t2_id", "confidence"
            ).collect()
        }
        assert engine == oracle  # pairwise F1 == 1.0 by construction
        assert len(engine) > 50

    def test_cluster_quality_vs_ground_truth(self, spark, pages):
        """Pairwise P/R/F1 of predicted clusters vs GENERATOR truth on
        candidate pairs.  The north-rule >=0.99 gate is F1 vs the
        REFERENCE'S decisions at the same blocking keys — that is the
        previous test, which asserts exact equality (F1 == 1.0).  This
        auxiliary check measures semantic quality against synthetic
        truth; its ceiling is a generator property (variant-vs-variant
        mentions at mutual edit distance 2 are correctly rejected by
        the reference cascade), so the bar here is 0.95."""
        from name_match_latest_spark.operators.clustering import connected_components
        from name_match_latest_spark.plans.web_pipeline import (
            _block_key,
            match_mentions,
            prepare_mentions,
        )
        from name_match_latest_spark.operators.blocking import pair_join
        from pyspark.sql import functions as F

        prepared = prepare_mentions(pages, with_truth=True).cache()
        edges = match_mentions(prepared).select(
            F.col("t1_id").alias("src"), F.col("t2_id").alias("dst")
        )
        nodes = prepared.select("id", "true_entity")
        cc = connected_components(
            edges.unionByName(
                nodes.select(F.col("id").alias("src"), F.col("id").alias("dst"))
            )
        )
        assign = {r.node: r.component for r in cc.collect()}
        truth = {r.id: r.true_entity for r in nodes.collect()}

        cand = (
            pair_join(prepared, prepared, lambda p: [_block_key(p)])
            .filter(F.col("t1_id") < F.col("t2_id"))
            .select("t1_id", "t2_id")
            .collect()
        )
        tp = fp = fn = 0
        for r in cand:
            same_pred = assign.get(r.t1_id) == assign.get(r.t2_id)
            same_true = truth[r.t1_id] == truth[r.t2_id]
            if same_pred and same_true:
                tp += 1
            elif same_pred:
                fp += 1
            elif same_true:
                fn += 1
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)
        assert precision == 1.0, (tp, fp, fn)
        assert f1 >= 0.95, (tp, fp, fn, precision, recall, f1)


class TestResume:
    def test_checkpoint_resume_skips_committed(self, spark, pages, tmp_path):
        from name_match_latest_spark.plans.web_pipeline import run_resumable

        out = str(tmp_path / "run")
        with pytest.raises(RuntimeError, match="injected failure"):
            run_resumable(spark, pages, out, n_groups=6, fail_after_group=1)
        from name_match_latest_spark.plans.checkpoint import AuditLog
        import hashlib

        sig = hashlib.md5(b"web-pipeline-v1|6|").hexdigest()
        done_before = AuditLog(os.path.join(out, "audit"), sig).committed_groups()
        assert 0 < len(done_before) < 6

        metrics = run_resumable(spark, pages, out, n_groups=6)
        assert metrics["groups"] == 6
        # committed groups were not recomputed (their records survive)
        done_after = AuditLog(os.path.join(out, "audit"), sig).committed_groups()
        assert done_before <= done_after

        # clusters of resumed run == clusters of a clean one-shot run
        clean = str(tmp_path / "clean")
        m2 = run_resumable(spark, pages, clean, n_groups=6)
        a = {
            (r.url, r.mention_idx): r.cluster_id
            for r in spark.read.parquet(metrics["clusters_path"]).collect()
        }
        b = {
            (r.url, r.mention_idx): r.cluster_id
            for r in spark.read.parquet(m2["clusters_path"]).collect()
        }
        assert a == b

    def test_config_change_invalidates(self, spark, pages, tmp_path):
        from name_match_latest_spark.plans.checkpoint import AuditLog

        log = AuditLog(str(tmp_path / "a"), "sig1")
        log.commit(0, n=1)
        assert AuditLog(str(tmp_path / "a"), "sig1").committed_groups() == {0}
        assert AuditLog(str(tmp_path / "a"), "sig2").committed_groups() == set()


def test_resumable_equals_direct_clustering(spark, pages, tmp_path):
    """Group-partitioned resumable execution must produce the same
    clusters as the direct pipeline (groups are disjoint by block key,
    so the union of group edges == the full edge set)."""
    from name_match_latest_spark.plans.web_pipeline import cluster_pages, run_resumable

    direct = {
        (r.url, r.mention_idx): r.cluster_id
        for r in cluster_pages(pages).collect()
    }
    m = run_resumable(spark, pages, str(tmp_path / "rr"), n_groups=5)
    grouped = {
        (r.url, r.mention_idx): r.cluster_id
        for r in spark.read.parquet(m["clusters_path"]).collect()
    }
    assert direct == grouped
