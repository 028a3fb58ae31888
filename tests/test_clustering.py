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


def _merge(spark, labels, new_edges, new_nodes=None):
    from name_match_latest_spark.operators.clustering import merge_components

    ldf = spark.createDataFrame(list(labels.items()), ["node", "component"])
    edf = spark.createDataFrame(new_edges, "src long, dst long")
    ndf = (
        spark.createDataFrame([(n,) for n in new_nodes], ["id"])
        if new_nodes
        else None
    )
    return {
        r.node: r.component
        for r in merge_components(ldf, edf, new_nodes=ndf).collect()
    }


def test_merge_components_equals_full_recompute(spark):
    """Incremental update == batch CC over the union of all edges —
    on random splits, including edges that bridge previously separate
    components and brand-new nodes."""
    rng = random.Random(7)
    nodes = list(range(200))
    all_edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(260)]
    all_edges = [e for e in all_edges if e[0] != e[1]]
    cut = len(all_edges) // 2
    base, delta = all_edges[:cut], all_edges[cut:]

    base_nodes = {n for e in base for n in e}
    labels = union_find_components(base, base_nodes)
    got = _merge(spark, labels, delta)

    union_nodes = {n for e in all_edges for n in e}
    want = union_find_components(all_edges, union_nodes)
    # merge_components covers old nodes + delta endpoints; isolated
    # base nodes keep their label
    assert got == {n: want[n] for n in got}
    assert set(got) == base_nodes | {n for e in delta for n in e}


def test_merge_components_new_min_node_rewrites_old_component(spark):
    """A new node with a SMALLER id than the component minimum becomes
    the new component id everywhere (min-label invariant preserved)."""
    labels = {10: 10, 11: 10, 12: 10, 30: 30}
    got = _merge(spark, labels, [(5, 12)])
    assert got == {10: 5, 11: 5, 12: 5, 30: 30, 5: 5}


def test_merge_components_bridges_two_components(spark):
    labels = {1: 1, 2: 1, 10: 10, 11: 10, 20: 20}
    got = _merge(spark, labels, [(2, 11)], new_nodes=[99])
    assert got == {1: 1, 2: 1, 10: 1, 11: 1, 20: 20, 99: 99}


def test_merge_components_isolated_new_nodes_and_empty_delta(spark):
    labels = {1: 1, 2: 1}
    got = _merge(spark, labels, [], new_nodes=[7, 8])
    assert got == {1: 1, 2: 1, 7: 7, 8: 8}


def test_merge_components_chained_increments_match_batch(spark):
    """Three successive increments agree exactly with one batch run."""
    rng = random.Random(13)
    nodes = list(range(120))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    third = len(edges) // 3
    labels = union_find_components(
        edges[:third], {n for e in edges[:third] for n in e}
    )
    for delta in (edges[third : 2 * third], edges[2 * third :]):
        labels = _merge(spark, labels, delta)
    want = union_find_components(edges, {n for e in edges for n in e})
    assert labels == {n: want[n] for n in labels}


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
