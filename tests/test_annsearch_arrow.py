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
    hof = l2_topk(emb, queries, k=7).collect()
    arrow = l2_topk(emb, queries, k=7, impl="arrow").collect()
    _assert_identical(hof, arrow, "distance")


def test_cosine_arrow_bit_exact(spark):
    from name_match_latest_spark.operators.annsearch import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(17)
    hof = cosine_topk(emb, queries, k=7).collect()
    arrow = cosine_topk(emb, queries, k=7, impl="arrow").collect()
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
    hof = cosine_topk(emb, queries, k=10).collect()
    arrow = cosine_topk(emb, queries, k=10, impl="arrow").collect()
    _assert_identical(hof, arrow, "cosine")
