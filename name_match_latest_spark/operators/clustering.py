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

__all__ = ["connected_components", "cluster_matches", "merge_components"]


def _canonical_checksum(e: DataFrame) -> tuple:
    """Order-insensitive checksum of an already-canonical edge set."""
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return (row.n, row.h)


def _symmetrize(e: DataFrame) -> DataFrame:
    """Both directions, WITHOUT distinct: the only consumer is a
    min-aggregation + join whose outputs are deduped downstream, and
    min() is duplicate-insensitive — saves a full shuffle per round."""
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return e.union(rev)


def _large_star(e_sym: DataFrame) -> DataFrame:
    """Connect every node's LARGER neighbors to min(Γ(u) ∪ {u}).
    Output is canonical: src > dst, distinct."""
    mins = e_sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    # NOT deduped: small-star's min-agg is duplicate-insensitive and its
    # output is distinct — skipping the dedup here saves a shuffle per
    # round (duplicate growth is bounded by node degree)
    return (
        e_sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Input must be canonical (src > dst, distinct — large-star output).
    Connects smaller neighbors and self to the per-node minimum.
    Output is canonical again."""
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    moved = (
        e.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        moved.union(self_edges).filter(F.col("src") != F.col("dst")).distinct()
    )


def _driver_union_find(e: DataFrame, nodes: DataFrame) -> DataFrame:
    """Exact min-label components via path-halving union-find on the
    driver (bounded by driver_threshold edges), same output contract
    as the distributed loop."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent.get(root, root)
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent.get(x, x)
        return root

    # collect(), not toLocalIterator(): this path only runs when the
    # edge count is <= driver_threshold (explicitly bounded driver
    # memory), and toLocalIterator costs one sequential fetch job PER
    # PARTITION — 32 round trips for a graph union-find takes
    # microseconds on (round-6 measurement)
    for row in e.collect():
        a, b = find(row.src), find(row.dst)
        if a != b:
            # union by MIN so roots are component minima directly
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo

    assign = {x: find(x) for x in list(parent)}
    spark = e.sparkSession
    if assign:
        import pandas as pd

        # pandas + Arrow path: createDataFrame from a plain Python list
        # pickles row-by-row; the Arrow batch upload is ~an order of
        # magnitude faster for the >10k-assignment maps seen here
        amap = spark.createDataFrame(
            pd.DataFrame(list(assign.items()), columns=["node", "component"]),
            schema=nodes.select("node").schema.add(
                "component", nodes.schema["node"].dataType
            ),
        )
        return nodes.join(amap, "node", "left").select(
            "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
        )
    return nodes.withColumn("component", F.col("node"))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_threshold: int = 1_000_000,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component id = minimum node id in the component.

    ``nodes`` (single-column DataFrame) is the universe of nodes when
    the caller already has it — isolated nodes get component = self.
    Passing it is the cheap path: deriving nodes from ``edges`` costs
    two extra executions of the (often expensive — a full match join)
    edge lineage, and callers that only have a node table otherwise
    have to union per-node self-edges into ``edges``, inflating the
    canonicalizing distinct for no information.

    Edge sets at or below ``driver_threshold`` take a driver-side
    union-find fast path: the distributed loop costs O(log n) rounds of
    shuffle+scheduling latency, a fixed ~seconds floor that dwarfs
    microseconds of union-find on a small graph (GraphFrames ships the
    same hybrid).  Memory is bounded and explicit: 1M edges ≈ tens of
    MB on the driver.  Above the threshold — the 100 TB regime — the
    alternating large-star/small-star loop runs as before."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if nodes is None:
        # checkpoint BEFORE deriving nodes: otherwise the (often
        # expensive — a full match join) edge lineage re-executes a
        # second time when the node set materializes at the final join
        e = e.localCheckpoint(eager=False)
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    e = e.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=False)
    n_edges = e.count()
    if n_edges == 0:
        return nodes.withColumn("component", F.col("node"))
    if n_edges <= driver_threshold:
        return _driver_union_find(e, nodes)

    # Shuffle width inside the loop is the SESSION's (plus AQE
    # coalescing of small post-shuffle partitions).  An earlier
    # version right-sized it by mutating spark.sql.shuffle.partitions
    # for the loop's duration — but SQLConf is session-global and
    # plans/jobs.py explicitly supports CONCURRENT job groups in one
    # session: a query on another thread would silently execute at
    # the CC loop's width.  Below driver_threshold the union-find
    # path already avoids the many-small-jobs overhead that mutation
    # targeted; above it (the 100 TB regime) the session width is the
    # right width, and AQE handles the shrinking tail rounds.

    # one action per round: lazy localCheckpoint truncates the logical
    # plan every round (nested star-join plans otherwise grow
    # geometrically and drown the driver in re-analysis), while the
    # checksum aggregation doubles as the materializing action
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(_symmetrize(e))).localCheckpoint(eager=False)
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


def merge_components(
    labels: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    changes_only: bool = False,
) -> DataFrame:
    """Incrementally fold new match edges into an existing
    ``(node, component)`` assignment — the continuous-crawl operator:
    yesterday's 10^12-row cluster table + today's new pages must NOT
    re-cluster the world.

    Condensed-graph construction (equivalent to CC on the union graph,
    asserted by tests):

    1. map each new-edge endpoint to its CURRENT component label
       (unknown nodes label themselves) — one join against ``labels``;
    2. run connected components on the condensed graph whose nodes are
       component labels.  Its size is bounded by the number of touched
       components, not by the corpus, so at crawl scale it is a tiny
       graph (driver union-find fast path);
    3. relabel: only components that actually merged appear in the
       remap, so the full label table is updated with one scan + one
       join against a remap that is small by construction —
       broadcast, no shuffle of the big table.

    ``new_nodes`` (optional, single column) registers nodes that may
    have no edges (isolated new mentions -> own component).  Output:
    the full updated ``(node, component)`` covering old nodes, new
    edge endpoints, and ``new_nodes``.  Component ids remain minimum
    node ids, so repeated incremental updates agree exactly with one
    batch recompute over the union of all edges.

    ``changes_only=True`` returns ONLY the rows whose assignment
    changed or is new — the merge-on-read DELTA a label store appends
    per micro-batch (O(changes) written, not O(corpus); see
    streaming/incremental_cluster.py).
    """
    e = new_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    lab = labels.select("node", "component")

    # 1. endpoint -> current label (self for unseen nodes)
    src_lab = lab.select(
        F.col("node").alias("src"), F.col("component").alias("_sc")
    )
    dst_lab = lab.select(
        F.col("node").alias("dst"), F.col("component").alias("_dc")
    )
    cond = (
        e.join(src_lab, "src", "left")
        .join(dst_lab, "dst", "left")
        .select(
            F.coalesce(F.col("_sc"), F.col("src")).alias("src"),
            F.coalesce(F.col("_dc"), F.col("dst")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # materialized: the condensed lineage embeds two joins against
        # the (huge) label table, and CC touches its input 3+ times
        .localCheckpoint(eager=True)
    )

    # 2. CC over the touched-component graph (small by construction)
    cc = connected_components(cond)
    remap = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("_old"), F.col("component").alias("_new")
    )

    # 3a. existing nodes: relabel through the broadcast remap —
    # changes_only takes the inner join (rows in merged components
    # only); the full view keeps every row via left join + coalesce
    if changes_only:
        updated_old = lab.join(
            F.broadcast(remap), lab.component == F.col("_old"), "inner"
        ).select("node", F.col("_new").alias("component"))
    else:
        updated_old = lab.join(
            F.broadcast(remap), lab.component == F.col("_old"), "left"
        ).select(
            "node",
            F.coalesce(F.col("_new"), F.col("component")).alias("component"),
        )

    # 3b. nodes introduced by this increment: edge endpoints + declared
    # isolated nodes, minus already-labeled ones; their condensed label
    # is their own id, remapped the same way
    incoming = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    )
    if new_nodes is not None:
        incoming = incoming.union(
            new_nodes.select(F.col(new_nodes.columns[0]).alias("node"))
        )
    fresh = incoming.distinct().join(lab.select("node"), "node", "left_anti")
    updated_new = fresh.join(
        F.broadcast(remap), fresh.node == F.col("_old"), "left"
    ).select("node", F.coalesce(F.col("_new"), F.col("node")).alias("component"))

    return updated_old.unionByName(updated_new)


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
