"""Deterministic hash sampling / stratified rates / split assignment,
cross-checked against a pure-Python md5 replica, plus bigram
collocations vs a hand-computed corpus."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from name_match_latest_spark.operators.sampling import (
    hash_sample,
    split_assign,
    stratified_sample,
)
from name_match_latest_spark.operators.textstats import bigram_collocations

B32 = 1 << 32


def py_bucket(key, seed=""):
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8], 16)


def _docs(spark, n=400):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


class TestHashSample:
    def test_matches_python_replica(self, spark):
        kept = {
            r.doc_id
            for r in hash_sample(_docs(spark), 0.3, "doc_id", seed="s1").collect()
        }
        expect = {
            i for i in range(400) if py_bucket(i, "s1") < round(0.3 * B32)
        }
        assert kept == expect
        assert 0 < len(kept) < 400

    def test_idempotent_under_growth(self, spark):
        small = {
            r.doc_id for r in hash_sample(_docs(spark, 200), 0.5, "doc_id").collect()
        }
        big = {
            r.doc_id for r in hash_sample(_docs(spark, 400), 0.5, "doc_id").collect()
        }
        assert small == {i for i in big if i < 200}

    def test_edge_rates(self, spark):
        assert hash_sample(_docs(spark), 0.0, "doc_id").count() == 0
        assert hash_sample(_docs(spark), 1.0, "doc_id").count() == 400

    def test_seed_changes_selection(self, spark):
        a = {r.doc_id for r in hash_sample(_docs(spark), 0.5, "doc_id", "a").collect()}
        b = {r.doc_id for r in hash_sample(_docs(spark), 0.5, "doc_id", "b").collect()}
        assert a != b


class TestStratifiedSample:
    def test_per_stratum_rates(self, spark):
        rates = {"en": 1.0, "de": 0.4}
        out = stratified_sample(
            _docs(spark), "lang", rates, "doc_id", seed="z"
        ).collect()
        got = {(r.doc_id, r.lang) for r in out}
        for i in range(400):
            lang = ["en", "de", "fr"][i % 3]
            rate = rates.get(lang, 0.0)
            keep = py_bucket(i, "z") < round(rate * B32)
            assert ((i, lang) in got) == keep, (i, lang)

    def test_default_rate(self, spark):
        out = stratified_sample(
            _docs(spark), "lang", {"en": 0.0}, "doc_id", default_rate=1.0
        )
        langs = {r.lang for r in out.collect()}
        assert langs == {"de", "fr"}


class TestSplitAssign:
    def test_total_and_exclusive(self, spark):
        out = split_assign(
            _docs(spark), {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id"
        ).collect()
        assert len(out) == 400
        counts = {}
        for r in out:
            counts[r.split] = counts.get(r.split, 0) + 1
            lo_train = py_bucket(r.doc_id) < round(0.8 * B32)
            if lo_train:
                assert r.split == "train"
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"]

    def test_matches_python_ranges(self, spark):
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        t1, t2 = round(0.8 * B32), round((0.8 + 0.1) * B32)
        out = split_assign(_docs(spark), w, "doc_id", seed="q").collect()
        for r in out:
            b = py_bucket(r.doc_id, "q")
            expect = "train" if b < t1 else "val" if b < t2 else "test"
            assert r.split == expect

    def test_bad_weights_raise(self, spark):
        import pytest

        with pytest.raises(ValueError):
            split_assign(_docs(spark), {"a": 0.5, "b": 0.4}, "doc_id")


class TestBigramCollocations:
    def test_hand_computed(self, spark):
        rows = [
            (1, "new york new york is big"),
            (2, "new york and old boston"),
            (3, "boston is old"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = bigram_collocations(docs, top_n=100, min_count=3).collect()
        # bigrams: doc1: (new,york)x2 (york,new) (york,is) (is,big);
        # doc2: (new,york) (york,and) (and,old) (old,boston);
        # doc3: (boston,is) (is,old)  -> T = 11
        assert len(out) == 1
        r = out[0]
        assert (r.term_a, r.term_b, r.n_ab) == ("new", "york", 3)
        assert r.n_a == 3 and r.n_b == 3  # marginals over bigram slots
        assert r.lift == 3 * 11 / (3 * 3)

    def test_min_count_and_topn(self, spark):
        rows = [(1, "a b a b a b c d")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = bigram_collocations(docs, top_n=1, min_count=1).collect()
        assert len(out) == 1
        out2 = bigram_collocations(docs, top_n=10, min_count=3).collect()
        assert {(r.term_a, r.term_b) for r in out2} == {("a", "b")}

    def test_no_cross_document_pairs(self, spark):
        rows = [(1, "alpha beta"), (2, "beta gamma")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r.term_a, r.term_b)
            for r in bigram_collocations(docs, top_n=10, min_count=1).collect()
        }
        assert pairs == {("alpha", "beta"), ("beta", "gamma")}

    def test_separator_fragments_dropped(self, spark):
        # empties from punctuation must not break adjacency
        rows = [(1, "foo... bar!!! foo, bar")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            (r.term_a, r.term_b): r.n_ab
            for r in bigram_collocations(docs, top_n=10, min_count=1).collect()
        }
        assert out == {("foo", "bar"): 2, ("bar", "foo"): 1}


class TestNullKeys:
    def _with_null(self, spark):
        return spark.createDataFrame(
            [(None, "en"), ("7", "en"), ("9", "de")],
            "doc_id string, lang string",
        )

    def test_samplers_drop_null_keys(self, spark):
        df = self._with_null(spark)
        assert {
            r.doc_id for r in hash_sample(df, 1.0, "doc_id").collect()
        } == {"7", "9"}
        assert {
            r.doc_id
            for r in stratified_sample(
                df, "lang", {"en": 1.0, "de": 1.0}, "doc_id"
            ).collect()
        } == {"7", "9"}

    def test_split_assign_null_key_gets_null_split(self, spark):
        out = {
            r.doc_id: r.split
            for r in split_assign(
                self._with_null(spark), {"train": 0.9, "test": 0.1}, "doc_id"
            ).collect()
        }
        assert out[None] is None
        assert out["7"] in ("train", "test") and out["9"] in ("train", "test")


class TestStreamingLegality:
    """The samplers are stateless Column predicates, so they must run
    UNCHANGED on an unbounded stream (no state store, no watermark) —
    a crawl firehose can be sampled/split on ingest, with decisions
    identical to the batch pass over the same rows."""

    def test_stream_sample_and_split_equal_batch(self, spark, tmp_path):
        docs = _docs(spark, 300)
        src = str(tmp_path / "in")
        docs.write.parquet(src)

        stream = spark.readStream.schema("doc_id long, lang string").parquet(src)
        sampled = hash_sample(stream, 0.4, "doc_id", seed="st")
        splitd = split_assign(sampled, {"train": 0.7, "test": 0.3}, "doc_id")
        assert splitd.isStreaming

        q = (
            splitd.writeStream.format("memory")
            .queryName("stream_sampled")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.doc_id, r.split)
            for r in spark.sql("select * from stream_sampled").collect()
        }
        want = {
            (r.doc_id, r.split)
            for r in split_assign(
                hash_sample(docs, 0.4, "doc_id", seed="st"),
                {"train": 0.7, "test": 0.3},
                "doc_id",
            ).collect()
        }
        assert got == want and len(got) > 0


class TestTemperatureSample:
    """Temperature rebalancing vs a pure-Python replica of the
    quantized-sqrt threshold arithmetic."""

    def _docs(self, spark):
        rows = [
            (i, "en" if i % 10 < 7 else ("de" if i % 10 < 9 else "fr"))
            for i in range(1000)
        ] + [(1000, None)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_matches_python_replica(self, spark):
        import math

        from name_match_latest_spark.operators.sampling import (
            temperature_sample,
            temperature_thresholds,
        )

        df = self._docs(spark)
        kept = {
            r.doc_id
            for r in temperature_sample(
                df, budget_frac=0.4, seed="tt"
            ).collect()
        }
        counts = {"en": 700, "de": 200, "fr": 100}
        thr = temperature_thresholds(counts, 0.4)
        expect = set()
        for i in range(1000):
            lang = "en" if i % 10 < 7 else ("de" if i % 10 < 9 else "fr")
            if py_bucket(i, "tt") < thr[lang]:
                expect.add(i)
        assert kept == expect
        assert 1000 not in kept  # NULL stratum dropped

    def test_low_resource_upweighted(self, spark):
        from name_match_latest_spark.operators.sampling import (
            temperature_thresholds,
        )

        thr = temperature_thresholds({"en": 700, "de": 200, "fr": 100}, 0.4)
        # alpha=0.5 keep RATES: rarer strata sampled at higher rates
        assert thr["fr"] > thr["de"] > thr["en"]

    def test_alpha_one_is_proportional(self, spark):
        from name_match_latest_spark.operators.sampling import (
            temperature_thresholds,
        )

        thr = temperature_thresholds(
            {"en": 700, "de": 200, "fr": 100}, 0.4, alpha=1.0
        )
        # p^1 shares reproduce the input distribution: every stratum
        # keeps ~budget_frac (equal thresholds up to quantization)
        vals = sorted(thr.values())
        assert vals[-1] - vals[0] <= (1 << 32) // 100_000  # within ~1e-5

    def test_rate_caps_at_one(self, spark):
        from name_match_latest_spark.operators.sampling import (
            temperature_thresholds,
        )

        # tiny stratum at high budget: B*q/n > 1 -> rate capped
        thr = temperature_thresholds({"en": 990, "fr": 10}, 0.9)
        assert thr["fr"] == 1 << 32

    def test_ultra_rare_stratum_never_zeroed(self, spark):
        from name_match_latest_spark.operators.sampling import (
            temperature_thresholds,
        )

        # p < 2^-40: quantized share floors at 1, not 0 — a present
        # stratum must never be silently dropped
        thr = temperature_thresholds(
            {"en": (1 << 41), "xx": 1}, budget_frac=0.5
        )
        assert thr["xx"] > 0

    def test_budget_frac_validated(self, spark):
        import pytest

        from name_match_latest_spark.operators.sampling import (
            temperature_thresholds,
        )

        with pytest.raises(ValueError):
            temperature_thresholds({"en": 10}, budget_frac=1.5)
