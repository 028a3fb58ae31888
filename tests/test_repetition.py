"""Repetition stats / boilerplate n-grams / quality gate vs a pure
Python replica, plus edge cases (empty, single-token, all-same docs)
and partitioning invariance."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from name_match_latest_spark.operators.repetition import (
    boilerplate_ngrams,
    repetition_quality_gate,
    token_repetition_stats,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "spam spam spam spam spam"),  # one token repeated
    (2, "buy now buy now buy now buy now"),  # bigram stuffing
    (3, ""),  # empty
    (4, None),  # null text
    (5, "x"),  # single token: no bigrams
    (6, "Unique words only here today"),  # no repetition, mixed case
    (7, "the cat sat on a rug"),  # shares 'the cat sat' with doc 0
]


def py_stats(text):
    toks = (
        [t for t in text.lower().split() if t]
        if isinstance(text, str)
        else []
    )
    n = len(toks)
    if n == 0:
        return (0, 0, 0, 0.0, 0, 0.0, 0, 0.0)
    uni = Counter(toks)
    n_chars = sum(c * len(t) for t, c in uni.items())
    top_tok = max(c * len(t) for t, c in uni.items())
    top_big = (
        max(
            c * len(g)
            for g, c in Counter(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ).items()
        )
        if n >= 2
        else 0
    )
    return (
        n,
        len(uni),
        n_chars,
        (n - len(uni)) / n,
        top_tok,
        top_tok / n_chars,
        top_big,
        top_big / n_chars if n_chars else 0.0,
    )


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestTokenRepetitionStats:
    def test_matches_python_replica(self, spark):
        got = {
            r.doc_id: (
                r.n_tokens,
                r.n_distinct_tokens,
                r.n_token_chars,
                r.dup_token_frac,
                r.top_token_chars,
                r.top_token_frac,
                r.top_bigram_chars,
                r.top_bigram_frac,
            )
            for r in token_repetition_stats(_df(spark)).collect()
        }
        assert set(got) == {d for d, _ in DOCS}  # every doc gets a row
        for doc_id, text in DOCS:
            assert got[doc_id] == py_stats(text), doc_id

    def test_known_values(self, spark):
        got = {r.doc_id: r for r in token_repetition_stats(_df(spark)).collect()}
        # doc 1: 5x 'spam' -> 1 distinct, dup frac 0.8, top token 5*4=20
        assert got[1].n_tokens == 5
        assert got[1].n_distinct_tokens == 1
        assert got[1].dup_token_frac == 0.8
        assert got[1].top_token_chars == 20
        assert got[1].top_token_frac == 1.0
        # doc 2: 'buy now' x4 covers 4*7=28 of 24 token chars + joins
        assert got[2].top_bigram_chars == 4 * len("buy now")
        # empty / null / single-token
        assert got[3].n_tokens == 0 and got[3].top_bigram_frac == 0.0
        assert got[4].n_tokens == 0
        assert got[5].n_tokens == 1 and got[5].top_bigram_chars == 0

    def test_partitioning_invariant(self, spark):
        a = sorted(
            map(tuple, token_repetition_stats(_df(spark)).collect())
        )
        b = sorted(
            map(
                tuple,
                token_repetition_stats(_df(spark).repartition(7)).collect(),
            )
        )
        assert a == b


class TestBoilerplateNgrams:
    def test_shared_trigram_found(self, spark):
        out = {
            r.ngram: (r.doc_freq, r.occurrences)
            for r in boilerplate_ngrams(_df(spark), n=3, min_docs=2).collect()
        }
        assert out == {"the cat sat": (2, 2), "cat sat on": (2, 2)}

    def test_occurrences_count_multiplicity(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c a b c"), (1, "a b c")], "doc_id long, text string"
        )
        out = {
            r.ngram: (r.doc_freq, r.occurrences)
            for r in boilerplate_ngrams(df, n=3, min_docs=2).collect()
        }
        assert out["a b c"] == (2, 3)  # doc 0 has it twice

    def test_min_docs_threshold(self, spark):
        assert (
            boilerplate_ngrams(_df(spark), n=3, min_docs=3).count() == 0
        )


class TestRepetitionGate:
    def test_filters_expected_docs(self, spark):
        kept = {
            r.doc_id
            for r in repetition_quality_gate(
                _df(spark),
                min_tokens=5,
                max_dup_token_frac=0.5,
                max_top_bigram_frac=0.5,
            ).collect()
        }
        # doc 0: 6 toks, dup 1/6, top bigram frac small -> kept
        # doc 1: dup 0.8 -> dropped;  doc 2: top bigram frac 1.0 -> dropped
        # docs 3,4,5: too short;  6: 5 unique toks kept;  7: kept
        assert kept == {0, 6, 7}


class TestStreamingLegality:
    """The per-doc quality ops are stateless Arrow scans (mapInPandas,
    no aggregation), so they must run UNCHANGED on an unbounded stream
    — a crawl firehose can be repetition-gated and classifier-scored
    on ingest, with decisions identical to the batch pass."""

    def test_stream_stats_and_score_equal_batch(self, spark, tmp_path):
        from name_match_latest_spark.operators.inference import (
            hashed_linear_score,
            md5_fixed_weights,
        )

        docs = _df(spark).where(F.col("text").isNotNull())
        src = str(tmp_path / "in")
        docs.write.parquet(src)
        w = md5_fixed_weights(64, "sw")

        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        stats_s = token_repetition_stats(stream)
        score_s = hashed_linear_score(stream, w, seed="ss")
        assert stats_s.isStreaming and score_s.isStreaming

        for name, sdf in (("st_stats", stats_s), ("st_score", score_s)):
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", str(tmp_path / ("ck_" + name)))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        got_stats = sorted(
            map(tuple, spark.sql("select * from st_stats").collect())
        )
        got_score = sorted(
            map(tuple, spark.sql("select * from st_score").collect())
        )
        assert got_stats == sorted(
            map(tuple, token_repetition_stats(docs).collect())
        )
        assert got_score == sorted(
            map(tuple, hashed_linear_score(docs, w, seed="ss").collect())
        )
        assert len(got_stats) > 0


class TestBigramSkip:
    def test_gate_skips_bigram_work_when_rule_disabled(self, spark):
        """compute_bigrams=False emits placeholder zeros; the gate
        with threshold 1.0 must produce the same KEPT SET as the full
        stats path (review finding: don't pay the bigram Counter for
        an always-pass rule)."""
        stats = token_repetition_stats(_df(spark), compute_bigrams=False)
        got = {r.doc_id: (r.top_bigram_chars, r.top_bigram_frac)
               for r in stats.collect()}
        assert all(v == (0, 0.0) for v in got.values())
        kept_skip = {
            r.doc_id
            for r in repetition_quality_gate(
                _df(spark), min_tokens=5, max_dup_token_frac=0.5,
                max_top_bigram_frac=1.0,
            ).collect()
        }
        kept_full = {
            r.doc_id
            for r in repetition_quality_gate(
                _df(spark), min_tokens=5, max_dup_token_frac=0.5,
                max_top_bigram_frac=1.0000001,
            ).collect()
        }
        assert kept_skip == kept_full
