"""PageRank (integer fixed point) and triangle counting.

The PageRank reference here is an INDEPENDENT pure-Python
implementation of the same integer recurrence — dict arithmetic, no
Spark — so a pass certifies the distributed plan computes the exact
recurrence, not that two copies of one implementation agree.
"""

from __future__ import annotations

import pytest

from name_match_latest_spark.operators.graph import pagerank, triangle_count

SCALE = 10**12


def py_pagerank(edges, iterations=5, scale=SCALE, num=85, den=100):
    """Reference: same fixed-point recurrence in plain dicts."""
    edges = sorted(set((str(a), str(b)) for a, b in edges))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    r = {v: scale for v in nodes}
    teleport = ((den - num) * scale) // den
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for a, b in edges:
            inflow[b] += r[a] // out[a]
        dang = sum(r[v] for v in nodes if v not in out)
        share = dang // len(nodes)
        r = {v: teleport + (num * (inflow[v] + share)) // den for v in nodes}
    return r


def spark_pagerank(spark, edges, **kw):
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    return {row.id: row.rank for row in pagerank(df, **kw).collect()}


class TestPagerank:
    def test_chain_matches_reference(self, spark):
        edges = [(1, 2), (2, 3), (3, 4)]
        assert spark_pagerank(spark, edges) == py_pagerank(edges)

    def test_star_hub_ranks_highest_and_matches(self, spark):
        # spokes all point at the hub; hub dangles (mass redistributes)
        edges = [(i, 0) for i in range(1, 8)]
        got = spark_pagerank(spark, edges)
        assert got == py_pagerank(edges)
        assert got["0"] == max(got.values())

    def test_cycle_is_uniform(self, spark):
        edges = [(0, 1), (1, 2), (2, 0)]
        got = spark_pagerank(spark, edges)
        assert got == py_pagerank(edges)
        assert len(set(got.values())) == 1

    def test_duplicate_and_bidirectional_edges(self, spark):
        edges = [(1, 2), (1, 2), (2, 1), (2, 3)]
        assert spark_pagerank(spark, edges) == py_pagerank(edges)

    def test_partitioning_invariance(self, spark):
        # integer arithmetic => bit-identical under any parallelism
        import random

        rng = random.Random(7)
        edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
        edges = [(a, b) for a, b in edges if a != b]
        df1 = spark.createDataFrame(
            [(str(a), str(b)) for a, b in edges], "src string, dst string"
        ).repartition(1)
        df13 = spark.createDataFrame(
            [(str(a), str(b)) for a, b in edges], "src string, dst string"
        ).repartition(13)
        r1 = {r.id: r.rank for r in pagerank(df1).collect()}
        r13 = {r.id: r.rank for r in pagerank(df13).collect()}
        assert r1 == r13 == py_pagerank(edges)

    def test_iterations_param(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
        for it in (1, 3):
            assert spark_pagerank(spark, edges, iterations=it) == py_pagerank(
                edges, iterations=it
            )


def n_tri(spark, edges):
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    return triangle_count(df).collect()[0].n_triangles


class TestTriangleCount:
    @pytest.mark.parametrize(
        "edges,expect",
        [
            ([(1, 2), (2, 3), (3, 1)], 1),  # triangle
            ([(1, 2), (2, 3), (3, 4), (4, 1)], 0),  # square
            # K4 has 4 triangles
            ([(a, b) for a in range(4) for b in range(4) if a < b], 4),
            ([(1, 2), (2, 1), (2, 3), (3, 1), (1, 1)], 1),  # dups/loops
            ([(1, 2)], 0),
        ],
    )
    def test_hand_graphs(self, spark, edges, expect):
        assert n_tri(spark, edges) == expect

    def test_two_shared_triangles(self, spark):
        # two triangles sharing edge (1,2)
        edges = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 1)]
        assert n_tri(spark, edges) == 2

    def test_matches_brute_force(self, spark):
        import itertools
        import random

        rng = random.Random(11)
        edges = {
            tuple(sorted((rng.randrange(12), rng.randrange(12))))
            for _ in range(40)
        }
        edges = {(a, b) for a, b in edges if a != b}
        adj = set(edges)
        brute = sum(
            1
            for x, y, z in itertools.combinations(range(12), 3)
            if (x, y) in adj and (y, z) in adj and (x, z) in adj
        )
        assert n_tri(spark, list(edges)) == brute


class TestPagerankOverflowSafety:
    def test_capacity_guard_raises(self, spark):
        edges = [(1, 2), (2, 3), (3, 4)]
        df = spark.createDataFrame(
            [(str(a), str(b)) for a, b in edges], "src string, dst string"
        )
        import pytest

        with pytest.raises(ValueError, match="2\\^62"):
            pagerank(df, scale=2**61)

    def test_hub_inflow_past_old_multiply_limit(self, spark):
        # scale 2^56, 3-spoke star: hub inflow = 3 * 2^56 ≈ 2.16e17, so
        # the pre-fix single multiply 85 * inflow ≈ 1.8e19 > int64 max
        # wrapped silently; the split damping must match the
        # arbitrary-precision reference exactly
        edges = [(1, 0), (2, 0), (3, 0)]
        got = spark_pagerank(spark, edges, scale=2**56)
        assert got == py_pagerank(edges, scale=2**56)
        assert all(v > 0 for v in got.values())

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src string, dst string")
        assert pagerank(df).count() == 0
