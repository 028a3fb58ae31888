"""Transitive clustering: connected components on the match-edge DataFrame.

North-rule operator with no reference analogue (the reference emits
raw pairs; clustering entities at 10^12 scale needs transitive
closure).  Implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") entirely with joins + aggregations:

  large-star: every node u connects its LARGER neighbors to
              m(u) = min(Γ(u) ∪ {u})
  small-star: over larger→smaller directed edges, every node connects
              its smaller neighbors (and itself) to the minimum

Converges in O(log n) rounds to star graphs rooted at component
minima.  Each round is two shuffles (groupBy min + join); lineage is
truncated every round via localCheckpoint so plans don't grow
unboundedly (the Spark translation of the reference's per-chunk
checkpointing discipline, util/checkpoint.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "cluster_matches"]


def _canonical_checksum(e: DataFrame) -> int:
    """Order-insensitive checksum of the canonicalized edge set."""
    row = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        )
        .collect()[0]
    )
    return (row.n, row.h)


def _symmetrize(e: DataFrame) -> DataFrame:
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return e.union(rev).filter(F.col("src") != F.col("dst")).distinct()


def _large_star(e_sym: DataFrame) -> DataFrame:
    mins = e_sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    out = (
        e_sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    d = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    mins = d.groupBy("src").agg(F.min("dst").alias("m"))
    moved = (
        d.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        moved.union(self_edges).filter(F.col("src") != F.col("dst")).distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component id = minimum node id in the component."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = e.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    if e.isEmpty():
        return nodes.withColumn("component", F.col("node"))

    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(_symmetrize(e))).localCheckpoint()
        cur = _canonical_checksum(e)
        if cur == prev:
            break
        prev = cur

    # at convergence every edge points node -> component root
    assign = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    assign = assign.groupBy("node").agg(F.min("component").alias("component"))
    return (
        nodes.join(assign, "node", "left")
        .select(
            "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
        )
    )


def cluster_matches(matches: DataFrame) -> DataFrame:
    """Match pairs -> entity clusters.  t1/t2 ids are moved into one
    id space (t2 ids negated-offset is NOT safe at 10^12 — use a
    side tag instead): node = (side, id), component = min by (id,
    side) ordering via a single synthetic long when ids fit, else
    struct keys.  Here ids are longs from disjoint ranges, so we use
    them directly."""
    edges = matches.select(
        F.col("t1_id").alias("src"), F.col("t2_id").alias("dst")
    )
    return connected_components(edges)
