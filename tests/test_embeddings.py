"""Fixed-point label centroids: hand-computed values, partitioning
bit-invariance, negative components."""

from __future__ import annotations

import math

from name_match_latest_spark.operators.embeddings import label_centroids


def _vecs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(parts)


def test_hand_computed(spark):
    rows = [
        (1, [1.0, -2.0], 0),
        (2, [3.0, 0.5], 0),
        (3, [10.0, 20.0], 7),
    ]
    out = {
        (r.label, r.dim): r for r in label_centroids(_vecs(spark, rows)).collect()
    }
    s = 1 << 24
    assert out[(0, 1)].c_fx == math.floor(1.0 * s) + math.floor(3.0 * s)
    assert out[(0, 1)].n_vecs == 2
    assert out[(0, 1)].centroid == out[(0, 1)].c_fx / (2 * s)
    # floor of negatives rounds toward -inf, exactly as specified
    assert out[(0, 2)].c_fx == math.floor(-2.0 * s) + math.floor(0.5 * s)
    assert out[(7, 2)].centroid == math.floor(20.0 * s) / s


def test_partitioning_bit_invariance(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(300)
    ]
    a = {
        (r.label, r.dim): (r.c_fx, r.n_vecs, r.centroid)
        for r in label_centroids(_vecs(spark, rows, parts=1)).collect()
    }
    b = {
        (r.label, r.dim): (r.c_fx, r.n_vecs, r.centroid)
        for r in label_centroids(_vecs(spark, rows, parts=23)).collect()
    }
    assert a == b
    assert len(a) == 3 * 8


def test_centroid_close_to_float_mean(spark):
    rows = [(i, [0.25 * i], 0) for i in range(10)]
    r = label_centroids(_vecs(spark, rows)).collect()[0]
    mean = sum(0.25 * i for i in range(10)) / 10
    assert abs(r.centroid - mean) < 1e-6


def test_null_hygiene_pairwise_exclusion(spark):
    rows = [
        (1, [1.0, 2.0], 0),
        (2, None, 0),            # null embedding: contributes nothing
        (3, [4.0], 0),           # short vector: only dim 1
        (4, [None, 8.0], 0),     # null component: dim 2 only
    ]
    out = {
        (r.label, r.dim): (r.n_vecs, r.c_fx)
        for r in label_centroids(_vecs(spark, rows)).collect()
    }
    s = 1 << 24
    assert out[(0, 1)] == (2, (1 * s) + (4 * s))
    assert out[(0, 2)] == (2, (2 * s) + (8 * s))
    assert len(out) == 2
