"""TF-IDF top-terms: hand-computed scores, tokenizer semantics, exact
cross-engine log parity, and the fast JVM-log path."""

from __future__ import annotations

import math

from name_match_latest_spark.operators.textstats import tfidf_top_terms

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat! CAT? cat... umbrella"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_scores(spark):
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.score)
        for r in tfidf_top_terms(_docs(spark), k=10).collect()
    }
    n = 3
    # doc 3: 'cat' tf=3 df=2, 'umbrella' tf=1 df=1
    assert out[(3, "cat")] == (3, 2, 3 * math.log(n / 2))
    assert out[(3, "umbrella")] == (1, 1, math.log(n / 1))
    # 'the' appears in docs 1 and 2 -> df=2; doc 1 tf=2
    assert out[(1, "the")] == (2, 2, 2 * math.log(n / 2))
    # 'sat' df=2 tf=1 in both docs
    assert out[(2, "sat")] == (1, 2, math.log(n / 2))


def test_topk_and_tiebreak(spark):
    rows = [(1, "aa bb"), (2, "zz")]  # aa/bb tie in doc 1 -> term asc
    got = [
        (r.rank, r.term)
        for r in tfidf_top_terms(_docs(spark, rows), k=2)
        .where("doc_id = 1")
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, "aa"), (2, "bb")]


def test_k_limits_rows(spark):
    out = tfidf_top_terms(_docs(spark), k=1).collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3]
    assert all(r.rank == 1 for r in out)


def test_tokenizer_ascii_alnum_runs(spark):
    # non-ASCII chars are separators; kept terms are lowercased ASCII
    rows = [(1, "Café café 42x 42x 中文 B2B")]
    out = {r.term: r.tf for r in tfidf_top_terms(_docs(spark, rows), k=10).collect()}
    assert out == {"caf": 2, "42x": 2, "b2b": 1}


def test_exact_log_is_libm(spark):
    # scores on the exact path are bit-identical to math.log products
    out = tfidf_top_terms(_docs(spark), k=10).collect()
    for r in out:
        assert r.score == r.tf * math.log(3 / r.df)


def test_jvm_log_path_same_ranking(spark):
    exact = {
        (r.doc_id, r.rank): r.term
        for r in tfidf_top_terms(_docs(spark), k=3).collect()
    }
    jvm = {
        (r.doc_id, r.rank): r.term
        for r in tfidf_top_terms(_docs(spark), k=3, exact_log=False).collect()
    }
    assert exact == jvm
