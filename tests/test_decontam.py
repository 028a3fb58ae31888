"""Train/test n-gram decontamination: hand-computed overlaps."""

from __future__ import annotations

from name_match_latest_spark.operators.decontam import cross_split_contamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, split string")


def test_hand_computed(spark):
    rows = [
        (1, "the quick brown fox jumps", "train"),
        (2, "a quick brown fox runs", "test"),
        (3, "totally different words here now", "test"),
    ]
    out = {r.doc_id: r for r in cross_split_contamination(_docs(spark, rows)).collect()}
    # doc2 trigrams: "a quick brown","quick brown fox","brown fox runs"
    # train trigrams: "the quick brown","quick brown fox","brown fox jumps"
    assert out[2].n_ngrams == 3 and out[2].n_shared == 1
    assert out[2].contamination == 1 / 3
    assert out[3].n_ngrams == 3 and out[3].n_shared == 0
    assert out[3].contamination == 0.0


def test_full_leak_detected(spark):
    rows = [
        (1, "alpha beta gamma delta", "train"),
        (2, "alpha beta gamma delta", "test"),  # exact leak
    ]
    r = cross_split_contamination(_docs(spark, rows)).collect()[0]
    assert (r.n_ngrams, r.n_shared, r.contamination) == (2, 2, 1.0)


def test_repeated_train_ngrams_count_once(spark):
    rows = [
        (1, "x y z x y z x y z", "train"),
        (2, "zzz x y z", "test"),
        (3, "x y z", "train"),  # same shingle again, another doc
    ]
    r = cross_split_contamination(_docs(spark, rows)).collect()[0]
    # test trigrams: "zzz x y","x y z" -> one hit, counted once
    assert (r.n_ngrams, r.n_shared) == (2, 1)


def test_short_test_doc_has_no_row(spark):
    rows = [(1, "a b c d", "train"), (2, "one two", "test")]
    assert cross_split_contamination(_docs(spark, rows)).count() == 0


def test_other_splits_ignored(spark):
    rows = [
        (1, "p q r s", "train"),
        (2, "p q r s", "val"),     # val must not count as train or test
        (3, "u v w p q r", "test"),
    ]
    r = cross_split_contamination(_docs(spark, rows)).collect()[0]
    assert r.doc_id == 3 and r.n_shared == 1  # only "p q r" via train doc 1


def test_ngram_width_param(spark):
    rows = [(1, "a b c d", "train"), (2, "b c d e", "test")]
    r2 = cross_split_contamination(_docs(spark, rows), n=2).collect()[0]
    # test bigrams: bc cd de ; train bigrams: ab bc cd -> 2 shared
    assert (r2.n_ngrams, r2.n_shared) == (3, 2)
