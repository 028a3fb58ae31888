"""Connected components vs a union-find oracle on adversarial graphs."""

from __future__ import annotations

import random


def union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-label per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _spark_cc(spark, edges):
    from name_match_latest_spark.operators.clustering import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.node: r.component
        for r in connected_components(df).collect()
    }


def test_chain(spark):
    # worst case for naive propagation: a long path
    edges = [(i, i + 1) for i in range(60)]
    nodes = set(range(61))
    assert _spark_cc(spark, edges) == union_find_components(edges, nodes)


def test_random_graphs(spark):
    rng = random.Random(1)
    nodes = list(range(0, 400, 3))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    present = {n for e in edges for n in e}
    assert _spark_cc(spark, edges) == union_find_components(edges, present)


def test_self_loops_and_dups(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (7, 9)]
    present = {5, 1, 2, 7, 9}
    assert _spark_cc(spark, edges) == union_find_components(edges, present)


def test_explicit_node_universe_covers_isolated_nodes(spark):
    """Passing nodes= must assign component=self to isolated nodes
    (no self-edge union needed) on BOTH physical paths, and must not
    change components of connected nodes."""
    from name_match_latest_spark.operators.clustering import connected_components

    edges = [(3, 7), (7, 12)]
    node_universe = [3, 7, 12, 50, 99]  # 50, 99 isolated
    edf = spark.createDataFrame(edges, ["src", "dst"])
    ndf = spark.createDataFrame([(n,) for n in node_universe], ["id"])

    want = {3: 3, 7: 3, 12: 3, 50: 50, 99: 99}
    for thr in (1_000_000, 0):
        got = {
            r.node: r.component
            for r in connected_components(edf, nodes=ndf, driver_threshold=thr).collect()
        }
        assert got == want, f"threshold={thr}"


def test_distributed_loop_equals_driver_fast_path(spark):
    """Both physical paths — driver union-find (small graphs) and the
    alternating-star distributed loop — must produce identical
    components (the fast path handles <= driver_threshold edges;
    forcing threshold=0 exercises the loop on the same graph)."""
    from name_match_latest_spark.operators.clustering import connected_components

    rng = random.Random(31)
    nodes = list(range(300))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(350)]
    df = spark.createDataFrame(edges, ["src", "dst"])

    fast = {r.node: r.component for r in connected_components(df).collect()}
    dist = {
        r.node: r.component
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert fast == dist
    want = union_find_components(
        edges, {n for e in edges for n in e}
    )
    assert fast == want
