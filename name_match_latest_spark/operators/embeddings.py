"""Deterministic embedding aggregation: fixed-point class centroids.

Floating-point sums are NOT associative, so a naive distributed mean
over an embedding column changes in the last bits with every
partitioning, AQE decision, or retry — which breaks result caching,
cross-run diffing, and any hash-based verification of an ML
preprocessing pipeline.  The same fixed-point trick the PageRank
operator uses (graph.py) fixes it: quantize each component to a
64-bit integer (``floor(v * 2^scale_bits)``), sum integers (exact,
associative, order-independent), divide once at the end.  With
float32 inputs (|v| < ~2e3) and scale_bits=24, a single component
contributes < 2^35 — over 2^28 rows per (label, dim) group the sum
stays < 2^63, and the quantization error per component is bounded by
n / 2^24, i.e. below float32 resolution for any practical group size.

Plan: posexplode to (label, dim, v) then ONE hash aggregate — the
64x row fan-out is absorbed map-side by partial aggregation, so the
shuffle carries exactly (labels x dims) partial rows per task, not
the exploded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_centroids"]


def label_centroids(
    vecs: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale_bits: int = 24,
) -> DataFrame:
    """Per-(label, dim) centroid of an ``array<float>`` column in
    exact fixed-point arithmetic: returns ``(label, dim, n_vecs,
    c_fx, centroid)`` where ``c_fx = sum(floor(v * 2^scale_bits))``
    (a BIGINT, bit-identical under any partitioning or engine) and
    ``centroid = c_fx / (n_vecs * 2^scale_bits)`` (one correctly-
    rounded double division of exact integers).  ``dim`` is 1-based.

    Null hygiene (pairwise exclusion): ``n_vecs`` counts NON-NULL
    components per (label, dim) — a NULL embedding or a short vector
    simply contributes nothing to any dim, and a NULL component
    contributes nothing to its dim, instead of silently biasing the
    mean toward 0 (count(*) would count it while sum skipped it).
    """
    scale = 1 << scale_bits
    comp = vecs.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * F.lit(float(scale)))
        .cast("long")
        .alias("v_fx"),
    ).where(
        # drop NULL components BEFORE the aggregate so a (label, dim)
        # group exists iff it has at least one non-null component —
        # the same group-existence rule the SQL twin applies
        F.col("v_fx").isNotNull()
    )
    return comp.groupBy("label", "dim").agg(
        F.count("*").alias("n_vecs"),
        F.sum("v_fx").alias("c_fx"),
    ).select(
        "label",
        "dim",
        "n_vecs",
        "c_fx",
        (
            F.col("c_fx").cast("double")
            / (F.col("n_vecs") * F.lit(scale)).cast("double")
        ).alias("centroid"),
    )
