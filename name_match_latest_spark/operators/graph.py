"""Graph analytics over edge tables: PageRank (fixed-point integer
arithmetic) and degree-ordered triangle counting.

Web-crawl pipelines rank hosts by link authority before scheduling
re-crawls and weigh near-dup resolution by page rank; both operators
run over an ``(src, dst)`` edge DataFrame that any join can produce
(host-link graph, co-citation graph, entity co-occurrence graph).

Scale design
------------
* ``pagerank`` is the classic synchronous iteration, but ALL
  arithmetic is 64-bit integer fixed point (rank mass scaled by
  ``scale``).  Integer sums are associative — the result is
  bit-identical regardless of partitioning, task order, or engine,
  which is what makes the operator hash-verifiable against an
  independent SQL implementation (float summation order would not
  be).  Each iteration is ONE shuffle (groupBy dst) plus a broadcast
  of two scalars (dangling mass, node count); the out-degree dim is
  computed once and re-joined.  Lineage is truncated per iteration
  with ``localCheckpoint`` so the plan does not grow with the
  iteration count (the CC operator's pattern, clustering.py).
* ``triangle_count`` uses the degree-ordered node-iterator: orient
  every undirected edge from the lower-(degree, id) endpoint to the
  higher one, then count length-2 paths that close.  Orientation
  bounds every node's out-degree by O(sqrt(m)), so the self-join
  explosion a raw 3-way join would hit on high-degree hubs cannot
  happen — the standard MapReduce triangle-counting bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_count"]


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``(src, dst)`` edges.

    Every node starts with integer mass ``scale``.  One iteration:

        r'(v) = (den-num)*scale/den
                + num * (sum_{u->v} r(u) div outdeg(u)
                         + dangling_total div n_nodes) div den

    with ``div`` = floor division on BIGINT, so the computation is
    exact and engine-independent (see module docstring).  Dangling
    mass (nodes with no out-edges) is redistributed uniformly, the
    standard correction.  Returns ``(id, rank)`` with rank in scaled
    integer units.

    Overflow safety: total rank mass stays <= n_nodes * scale, so any
    node's inflow is bounded by it too.  The damping multiply is SPLIT
    (``num*(x div den) + (num*(x mod den)) div den`` — algebraically
    exact for x >= 0) so it never multiplies the full inflow, and the
    operator REFUSES graphs where ``n_nodes * scale >= 2^62`` (sums
    could exceed int64, and non-ANSI Spark would wrap silently —
    identically at every parallelism level, so a bit-equality check
    would certify garbage).  For graphs past ~4.6M nodes, pass a
    smaller ``scale`` (e.g. ``2**20`` holds 4 x 10^12 nodes; per-node
    quantization error is 1/scale per iteration).

    At 10^12 edges: the per-iteration shuffle is the groupBy(dst);
    edges are checkpointed hash(src)-partitioned so the ranks⋈edges
    join needs no exchange, and the dangling scalar moves via
    broadcast, never a driver collect of node state.
    """
    # edges / outdeg / nodes are re-read EVERY iteration — checkpoint
    # them once or the distinct/groupBy lineage re-executes 5x.
    # edges are REPARTITIONED BY src before the checkpoint: distinct()
    # leaves them hash(src, dst)-partitioned, which forces a full
    # 20M-row re-exchange into the ranks⋈edges join EVERY iteration;
    # pinned to hash(src) that join (ranks are hash(id) off the
    # groupBy) needs no exchange at all, leaving the groupBy(dst)
    # contribution shuffle as the iteration's only data motion.
    edges = (
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        .distinct()
        .repartition(F.col("src"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (id, outdeg) is ITERATION-INVARIANT: join it once here instead of
    # re-joining outdeg against ranks inside every iteration (round-6:
    # one join + one checkpointed frame fewer per iteration).  The
    # rank state then carries outdeg along.
    state = (
        nodes.join(outdeg, nodes.id == outdeg.src, "left")
        .select("id", "outdeg")
        .localCheckpoint(eager=False)
    )
    # node count: one bounded driver-side scalar — used as a literal
    # in every iteration AND as the int64 capacity guard
    n_nodes = state.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(None).cast("long"))
    if n_nodes * scale >= 1 << 62:
        raise ValueError(
            f"n_nodes * scale = {n_nodes} * {scale} >= 2^62: total rank "
            "mass could overflow int64 (Spark would wrap SILENTLY at "
            "every parallelism level). Pass a smaller scale, e.g. 2**20."
        )

    ranks = state.withColumn("rank", F.lit(scale).cast("long"))
    teleport = ((damp_den - damp_num) * scale) // damp_den

    for _ in range(iterations):
        # dangling mass: ONE bounded 8-byte scalar per iteration,
        # folded into the plan as a literal — Python's // equals SQL
        # div for the non-negative int64 here, so the arithmetic stays
        # bit-exact.  (The previous broadcast-crossJoin form moved the
        # same scalar through the driver anyway — the broadcast build
        # collects to the driver — but paid an extra plan subtree and
        # broadcast-materialization job per iteration.)
        dang = ranks.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0))
        ).first()[0]
        # per-edge contribution: rank div outdeg (exact integer share)
        contrib = (
            # (a SHUFFLE_HASH hint here measured 43.0s vs 42.1s SMJ at
            # 20M edges local[32] — the edge-side sort is not the
            # bottleneck, so the default stays)
            ranks.where(F.col("outdeg").isNotNull())
            .join(edges, ranks.id == edges.src)
            .select(
                F.col("dst").alias("id"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # split damping: num*(x div den) + (num*(x mod den)) div den ==
        # (num*x) div den exactly for x >= 0, but never multiplies the
        # full inflow — num * x would overflow int64 on hub nodes whose
        # inflow approaches the total mass (see docstring)
        x = f"(coalesce(inflow, 0) + {int(dang) // n_nodes}L)"
        damped = (
            f"({damp_num} * ({x} div {damp_den})"
            f" + ({damp_num} * ({x} % {damp_den})) div {damp_den})"
        )
        ranks = (
            state.join(contrib, "id", "left")
            .select(
                "id",
                "outdeg",
                (F.lit(teleport).cast("long") + F.expr(damped)).alias("rank"),
            )
            # truncate lineage so the plan stays O(1) per iteration
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", "rank")


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over an UNDIRECTED graph given as a
    directed edge list (each edge may appear in either or both
    directions; self-loops ignored).

    Degree-ordered node-iterator: canonicalize edges to ``a < b``
    undirected form, orient each from the endpoint with smaller
    (degree, id), join oriented paths ``u->v->w`` with the oriented
    closing edge ``u->w``.  Returns a 1-row DataFrame
    ``(n_triangles)``.
    """
    und = (
        edges.select(
            F.least(F.col("src").cast("string"), F.col("dst").cast("string")).alias("a"),
            F.greatest(F.col("src").cast("string"), F.col("dst").cast("string")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        # referenced three times below (two path legs + closing edge):
        # checkpoint so the orientation joins run once
        .localCheckpoint(eager=False)
    )
    p1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    p2 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    wedges = p1.join(p2, "y").select("x", "y", "z")
    tri = wedges.join(closing, ["x", "z"])
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))
