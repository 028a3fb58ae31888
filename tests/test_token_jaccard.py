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


def test_dedup_cluster_reps_transitive(spark):
    """A~B and B~C collapse to ONE family even when A~C scores under
    the threshold — the reason pair lists alone under-delete."""
    from name_match_latest_spark.operators.dedup import dedup_cluster_reps

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mid = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    far = "nu xi gamma delta epsilon zeta eta theta iota lambda"
    other = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, base, "en"), (2, mid, "en"), (3, far, "en"), (4, other, "en")],
        "doc_id long, text string, lang string",
    )
    out = dedup_cluster_reps(docs, threshold=0.5, ngram=3, max_df=None)
    rows = {r.doc_id: (r.rep_id, r.cluster_size) for r in out.collect()}
    # J(1,2)=7/9, J(2,3)=6/10 above 0.5; J(1,3)=5/11 below; 4 isolated
    assert set(rows) == {1, 2, 3}
    assert all(rep == 1 and size == 3 for rep, size in rows.values())
