"""Recall gate for the banded embedding-LSH near-dup path.

Round-1 finding: a single conjunctive n-plane signature had measured
recall 0/1 (CORRECTNESS_r01: exact=1 pair, LSH=0).  The operator now
uses B bands of r planes OR'd (minhash-style); this test plants >=50
known near-dup pairs and gates recall_vs_exact >= 0.9.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

DIM = 64
N_BASE = 150
N_DUPS = 60
THRESHOLD = 0.5

SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)


def _corpus():
    """150 random unit vectors + 60 perturbed near-dups with planted
    cosines spread over [0.6, 0.95] (deterministic seed)."""
    rng = np.random.default_rng(1234)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(N_BASE)]
    for j in range(N_DUPS):
        target_cos = 0.6 + 0.35 * (j / (N_DUPS - 1))
        v = base[j]
        # orthogonal noise direction -> exact target cosine
        noise = rng.standard_normal(DIM)
        noise -= noise.dot(v) * v
        noise /= np.linalg.norm(noise)
        dup = target_cos * v + np.sqrt(1 - target_cos**2) * noise
        rows.append((N_BASE + j, dup.astype(np.float32).tolist()))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(_corpus(), SCHEMA).cache()


def _pairs(df):
    return {(r.d1, r.d2) for r in df.select("d1", "d2").collect()}


def test_banded_lsh_recall_vs_exact(spark, emb):
    from name_match_latest_spark.operators.annsearch import embedding_near_dups

    exact = _pairs(embedding_near_dups(emb, THRESHOLD, approximate=False))
    assert len(exact) >= 50, f"planted corpus too thin: {len(exact)} exact pairs"

    approx = _pairs(
        embedding_near_dups(emb, THRESHOLD, approximate=True, n_planes=8, bands=4)
    )
    # LSH candidates are a subset of all pairs; the cosine filter makes
    # every emitted pair a true pair (precision 1 by construction)
    assert approx <= exact

    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9 ({len(approx)}/{len(exact)})"


def test_band_assignment_shape(spark, emb):
    from name_match_latest_spark.operators.annsearch import lsh_band_assignments

    b = lsh_band_assignments(emb, n_planes=8, bands=4)
    n = emb.count()
    assert b.count() == 4 * n  # one row per (vector, band)
    assert b.select("band_id").distinct().count() == 4
    # bucket strings are r=2 bits
    assert b.filter(F.length("bucket") != 2).count() == 0


def test_l2_topk_matches_numpy(spark, emb):
    """Euclidean top-k agrees with a numpy brute-force oracle (ranks
    and distances), and broadcasts only the query side."""
    from name_match_latest_spark.operators.annsearch import l2_topk

    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    out = l2_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.distance))
    assert set(got) == {0, 1, 2}
    for qid, lst in got.items():
        lst.sort()
        q = vecs[qid]
        want = sorted(
            (float(np.sqrt(((v - q) ** 2).sum())), nid)
            for nid, v in vecs.items()
            if nid != qid
        )[:5]
        assert [n for _, n in want] == [n for _, n, _ in lst]
        for (wd, _), (_, _, gd) in zip(want, lst):
            assert gd == pytest.approx(wd, rel=1e-9)
