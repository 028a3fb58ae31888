"""Token-set and word-n-gram Jaccard near-dup semantics on
hand-computable fixtures (the driver oracle covers corpus scale; this
pins the metric definitions)."""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)


def _pairs(df):
    return {
        (r.d1, r.d2): round(r.jaccard, 6) for r in df.collect()
    }


def test_unigram_jaccard_ignores_order(spark):
    from name_match_latest_spark.operators.dedup import token_jaccard_pairs

    docs = spark.createDataFrame(
        [
            ("a", "one two three four", "en"),
            ("b", "four three two one", "en"),  # same set, reordered
            ("c", "one two three five", "en"),  # 3/5 overlap
        ],
        SCHEMA,
    )
    got = _pairs(token_jaccard_pairs(docs, threshold=0.5, max_df=None))
    assert got[("a", "b")] == 1.0  # reordering is invisible to unigrams
    assert got[("a", "c")] == 0.6
    assert got[("b", "c")] == 0.6


def test_ngram_jaccard_is_order_sensitive(spark):
    from name_match_latest_spark.operators.dedup import token_jaccard_pairs

    docs = spark.createDataFrame(
        [
            ("a", "one two three four", "en"),
            ("b", "four three two one", "en"),
            ("c", "one two three four five", "en"),
        ],
        SCHEMA,
    )
    got = _pairs(
        token_jaccard_pairs(docs, threshold=0.0, max_df=None, ngram=3)
    )
    # a: {one two three, two three four}; b: reversed — disjoint
    assert ("a", "b") not in got
    # c adds {three four five}: |inter|=2, |union|=3
    assert got[("a", "c")] == round(2 / 3, 6)


def test_ngram_short_docs_emit_nothing(spark):
    from name_match_latest_spark.operators.dedup import token_jaccard_pairs

    docs = spark.createDataFrame(
        [("a", "just two", "en"), ("b", "just two", "en"),
         ("c", "a full three gram doc", "en")],
        SCHEMA,
    )
    got = _pairs(
        token_jaccard_pairs(docs, threshold=0.0, max_df=None, ngram=3)
    )
    assert got == {}  # a/b have no 3-grams at all


def test_lang_partitions_candidates(spark):
    from name_match_latest_spark.operators.dedup import token_jaccard_pairs

    docs = spark.createDataFrame(
        [("a", "shared words here", "en"), ("b", "shared words here", "es")],
        SCHEMA,
    )
    assert (
        token_jaccard_pairs(docs, threshold=0.1, max_df=None).count() == 0
    )
