"""Arrow metric engine for brute-force top-k == the HOF fold,
bit-exactly (round-5 closure of the r4 nit: the HOF fold is
CodegenFallback; the Arrow path accumulates dimensions left-to-right
so floats, ties, and ranks are IDENTICAL — the oracle queries stay
green whichever impl serves them)."""

from __future__ import annotations

import math

SF_DIR = "/root/testdata/sf0.01"


def _key(r, metric):
    return (r.query_id, r.rank)


def _assert_identical(hof_rows, arrow_rows, metric):
    assert len(hof_rows) == len(arrow_rows) > 0
    h = {(r.query_id, r.rank): r for r in hof_rows}
    a = {(r.query_id, r.rank): r for r in arrow_rows}
    assert h.keys() == a.keys()
    for key, hr in h.items():
        ar = a[key]
        assert hr.neighbor_id == ar.neighbor_id, key
        hv, av = getattr(hr, metric), getattr(ar, metric)
        # bit-exact, not approx: both engines fold left-to-right
        assert math.isclose(hv, av, rel_tol=0.0, abs_tol=0.0), (key, hv, av)


def test_l2_arrow_bit_exact(spark):
    from name_match_latest_spark.operators.annsearch import l2_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(17)
    hof = l2_topk(emb, queries, k=7, impl="hof").collect()
    arrow = l2_topk(emb, queries, k=7).collect()  # default = arrow
    _assert_identical(hof, arrow, "distance")


def test_cosine_arrow_bit_exact(spark):
    from name_match_latest_spark.operators.annsearch import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(17)
    hof = cosine_topk(emb, queries, k=7, impl="hof").collect()
    arrow = cosine_topk(emb, queries, k=7).collect()  # default = arrow
    _assert_identical(hof, arrow, "cosine")


def test_arrow_partial_topk_survives_small_batches(spark):
    """Partial top-k per Arrow batch must never evict a row the
    global top-k needs — force many tiny batches so the partial/global
    boundary is exercised hard."""
    from name_match_latest_spark.operators.annsearch import cosine_topk

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(16)
    )
    queries = emb.orderBy("vec_id").limit(5)
    hof = cosine_topk(emb, queries, k=10, impl="hof").collect()
    arrow = cosine_topk(emb, queries, k=10).collect()  # default = arrow
    _assert_identical(hof, arrow, "cosine")


def test_cosine_zero_norm_raises_deterministically(spark):
    """Zero-norm vectors under cosine must RAISE in the Arrow engine
    (parity with the HOF engine's ANSI DIVIDE_BY_ZERO) — silent NaN
    handling would make inclusion depend on Arrow chunk boundaries."""
    import pytest
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from name_match_latest_spark.operators.annsearch import cosine_topk

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [0.0, 0.0]), (3, [3.0, 1.0])], schema
    )
    q = emb.filter("vec_id = 1")
    with pytest.raises(Exception, match="zero-norm"):
        cosine_topk(emb, q, k=2).collect()
    # zero-norm QUERY raises driver-side, before any job runs
    with pytest.raises(ValueError, match="zero-norm query"):
        cosine_topk(emb.filter("vec_id != 2"), emb.filter("vec_id = 2"), k=2)


def test_arrow_drops_null_and_ragged_vectors(spark):
    """Null / wrong-dimension corpus vectors are DROPPED by the Arrow
    engine (they can never produce a finite metric), and null query
    rows are dropped driver-side — no crash, results equal the clean
    corpus."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from name_match_latest_spark.operators.annsearch import l2_topk

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )
    clean = [(i, [float(i), float(i % 3), 1.0]) for i in range(1, 9)]
    dirty = clean + [(100, None), (101, [1.0])]  # null + ragged
    df_clean = spark.createDataFrame(clean, schema)
    df_dirty = spark.createDataFrame(dirty, schema)
    q = df_clean.filter("vec_id <= 2")
    want = {(r.query_id, r.rank, r.neighbor_id) for r in l2_topk(df_clean, q, k=3).collect()}
    got = {(r.query_id, r.rank, r.neighbor_id) for r in l2_topk(df_dirty, q, k=3).collect()}
    assert got == want
    # null QUERY rows dropped driver-side
    qn = df_dirty.filter("vec_id in (1, 100)")
    got_q = l2_topk(df_dirty, qn, k=3).collect()
    assert {r.query_id for r in got_q} == {1}
