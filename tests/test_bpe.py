"""BPE merge learning vs a pure-Python canonical reference learner:
the wrapped-token replace must equal greedy token-list merging on
every corpus, including the run/alternating cases where a naive
space-joined replace under-merges."""

from __future__ import annotations

from collections import Counter

from name_match_latest_spark.operators.bpe import (
    JOIN,
    bpe_merge_greedy,
    bpe_train,
)


def py_bpe(texts, n_merges):
    """Canonical reference learner over token LISTS (no strings)."""
    corpus = [[t for t in s.lower().split() if t] for s in texts]
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter(
            p for toks in corpus for p in zip(toks, toks[1:])
        )
        if not counts:
            break
        # max count, ties by (w1, w2) ascending
        (w1, w2), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, w1, w2, c))
        corpus = [bpe_merge_greedy(toks, w1, w2) for toks in corpus]
    return merges


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _got(spark, texts, k):
    return [
        (r.step, r.w1, r.w2, r.pair_count)
        for r in bpe_train(_df(spark, texts), n_merges=k)
        .orderBy("step")
        .collect()
    ]


class TestBpeTrain:
    def test_matches_canonical_reference(self, spark):
        texts = [
            "the cat sat on the mat",
            "the cat ate the cat food",
            "on the mat sat a cat",
        ]
        assert _got(spark, texts, 5) == py_bpe(texts, 5)

    def test_runs_merge_canonically(self, spark):
        # 'a a a a' must yield TWO (a,a) occurrences merged in step 1
        # (a space-joined replace would merge only one)
        texts = ["a a a a", "a a a"]
        got = _got(spark, texts, 2)
        assert got == py_bpe(texts, 2)
        assert got[0][1:] == ("a", "a", 5)  # 3 + 2 overlapping-counted
        # after step 1: [aa, aa], [aa, a] -> top pair (aa, aa) or (aa, a)
        assert got[1][1] == "a" + JOIN + "a"

    def test_alternating_merges_canonically(self, spark):
        texts = ["x y x y x y"]
        got = _got(spark, texts, 2)
        assert got == py_bpe(texts, 2)
        assert got[0][1:] == ("x", "y", 3)
        # step 1 merges ALL THREE (x,y) pairs -> step 2 pairs (xy, xy)
        assert got[1][1:] == ("x" + JOIN + "y", "x" + JOIN + "y", 2)

    def test_merged_symbols_recurse(self, spark):
        texts = ["a b c a b c a b"]
        got = _got(spark, texts, 3)
        assert got == py_bpe(texts, 3)
        assert got[0][1:3] == ("a", "b")
        assert got[1][1] == "a" + JOIN + "b"  # (ab, c) next

    def test_tie_break_lexicographic(self, spark):
        texts = ["b c", "a c"]  # (b,c) and (a,c) both count 1
        got = _got(spark, texts, 1)
        assert got == py_bpe(texts, 1)
        assert got[0][1:] == ("a", "c", 1)

    def test_early_stop_no_pairs(self, spark):
        assert _got(spark, ["solo", "", "x"], 4) == []


class TestBpeApply:
    def test_apply_equals_reference_merging(self, spark):
        from name_match_latest_spark.operators.bpe import bpe_apply

        texts = [
            "the cat sat on the mat",
            "a a a a x y x y",
            "the cat ate",
            "",
        ]
        merges = bpe_train(_df(spark, texts), n_merges=4)
        got = {
            r.id: list(r.tokens)
            for r in bpe_apply(_df(spark, texts), merges).collect()
        }
        # reference: apply the same merges with the token-list greedy
        table = [
            (r.step, r.w1, r.w2)
            for r in merges.orderBy("step").collect()
        ]
        for i, t in enumerate(texts):
            toks = [x for x in t.lower().split() if x]
            for _, w1, w2 in table:
                toks = bpe_merge_greedy(toks, w1, w2)
            assert got[i] == toks, (i, got[i], toks)
        assert got[3] == []  # empty doc -> empty token array

    def test_apply_accepts_plain_rows(self, spark):
        from name_match_latest_spark.operators.bpe import bpe_apply

        out = {
            r.id: list(r.tokens)
            for r in bpe_apply(
                _df(spark, ["x y z"]), [(1, "x", "y")]
            ).collect()
        }
        assert out == {0: ["x" + JOIN + "y", "z"]}


class TestStreamingLegality:
    """bpe_apply is a pure Column projection (wrap + n replaces +
    split), so a learned merge table tokenizes an unbounded stream
    UNCHANGED — the ingest-time tokenization story."""

    def test_stream_apply_equals_batch(self, spark, tmp_path):
        from name_match_latest_spark.operators.bpe import bpe_apply

        texts = ["the cat sat on the mat", "a a a a", "the cat ate"]
        docs = _df(spark, texts)
        merges = bpe_train(docs, n_merges=3)
        table = [(r.step, r.w1, r.w2) for r in merges.collect()]

        src = str(tmp_path / "in")
        docs.write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        toked = bpe_apply(stream, table)
        assert toked.isStreaming
        q = (
            toked.writeStream.format("memory")
            .queryName("st_bpe")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.id: list(r.tokens)
            for r in spark.sql("select * from st_bpe").collect()
        }
        want = {
            r.id: list(r.tokens) for r in bpe_apply(docs, table).collect()
        }
        assert got == want and len(got) == 3


class TestNullText:
    """Null-text docs are the EMPTY corpus state (review finding):
    training must not crash and apply must emit [], not NULL."""

    def test_train_survives_null_text(self, spark):
        df = spark.createDataFrame(
            [(0, "a b a b"), (1, None)], "doc_id long, text string"
        )
        got = [
            (r.step, r.w1, r.w2, r.pair_count)
            for r in bpe_train(df, n_merges=1).collect()
        ]
        assert got == [(1, "a", "b", 2)]

    def test_apply_empty_not_null_for_null_text(self, spark):
        from name_match_latest_spark.operators.bpe import bpe_apply

        df = spark.createDataFrame(
            [(0, "a b"), (1, None)], "doc_id long, text string"
        )
        out = {r.id: r.tokens for r in bpe_apply(df, [(1, "a", "b")]).collect()}
        assert out[1] == []  # not None
        assert out[0] == ["a" + JOIN + "b"]


class TestReplaceGreedyEquivalenceFuzz:
    """Property fuzz of the core claim: on the wrapped representation,
    non-overlapping left-to-right string replace == canonical
    single-pass greedy token-list merge, for ARBITRARY token sequences
    and ARBITRARY merge pairs (including runs, alternations, and
    pairs containing the \\x01 joiner from earlier merges).  Pure
    Python (the Spark/DuckDB engines share these exact replace
    semantics — pinned by the oracle and TestBpeTrain)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    toks_st = st.lists(
        st.text(alphabet="ab", min_size=1, max_size=2), min_size=0, max_size=30
    )

    @settings(max_examples=300, deadline=None)
    @given(toks=toks_st, w1=st.text(alphabet="ab", min_size=1, max_size=2),
           w2=st.text(alphabet="ab", min_size=1, max_size=2))
    def test_replace_equals_greedy(self, toks, w1, w2):
        from name_match_latest_spark.operators.bpe import EOT, JOIN, SOT

        s = "".join(SOT + t + EOT for t in toks)
        pat = SOT + w1 + EOT + SOT + w2 + EOT
        rep = SOT + w1 + JOIN + w2 + EOT
        merged_str = [t[1:] for t in s.replace(pat, rep).split(EOT) if t]
        assert merged_str == bpe_merge_greedy(toks, w1, w2)

    @settings(max_examples=60, deadline=None)
    @given(toks=toks_st, st_data=st.data())
    def test_chained_merges_equal_greedy(self, toks, st_data):
        """Several successive merges (pairs drawn from the CURRENT
        symbol sequence, so later pairs contain joined symbols) stay
        equivalent under chaining — the bpe_apply composition."""
        from hypothesis import strategies as st

        from name_match_latest_spark.operators.bpe import EOT, JOIN, SOT

        s = "".join(SOT + t + EOT for t in toks)
        cur = list(toks)
        for _ in range(3):
            if len(cur) < 2:
                break
            pairs = sorted(set(zip(cur, cur[1:])))
            w1, w2 = st_data.draw(st.sampled_from(pairs))
            s = s.replace(
                SOT + w1 + EOT + SOT + w2 + EOT, SOT + w1 + JOIN + w2 + EOT
            )
            cur = bpe_merge_greedy(cur, w1, w2)
            assert [t[1:] for t in s.split(EOT) if t] == cur
