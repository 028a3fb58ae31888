"""PageRank scaling evidence: the SAME 5-iteration fixed-point
PageRank at two parallelism levels — local[N] vs local[4N] — on the
SAME stored edge table, reporting throughput at both plus
efficiency = speedup / 4 (the north rule's two-cluster-size protocol,
emulated by parallelism levels in this single-box sandbox).

The graph is a deterministic scale-free-ish synthetic: out-edges per
node drawn from a hash so a few hubs exist (the skew case that matters
for a host-link graph), dst biased toward low node ids (preferential
attachment flavor).  Because the operator is INTEGER fixed point, the
two levels must produce bit-identical rank sums — asserted, which is
also the partitioning-invariance proof at scale.

Usage:
    python scripts/bench_pagerank_scale.py [n_edges] [N]

One JSON line to stdout; record in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

GEN = """
import sys
sys.path.insert(0, ".")
from name_match_latest_spark.session import get_spark
from pyspark.sql import functions as F

n_edges, path = int(sys.argv[1]), sys.argv[2]
n_nodes = max(1000, n_edges // 10)
spark = get_spark("gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
# deterministic edges: src spread uniformly, a slice of hub srcs with
# big fan-out via xxhash mixing; dst = biased toward low ids
e = (spark.range(n_edges, numPartitions=64)
     .select(
         F.pmod(F.xxhash64(F.col("id"), F.lit("src")), F.lit(n_nodes))
          .cast("string").alias("src"),
         F.pmod(
             F.pmod(F.xxhash64(F.col("id"), F.lit("dst")), F.lit(n_nodes))
             * F.pmod(F.xxhash64(F.col("id"), F.lit("bias")), F.lit(97)),
             F.lit(n_nodes),
         ).cast("string").alias("dst")))
e.write.mode("overwrite").parquet(path)
spark.stop()
"""

WORKER = """
import json, os, sys, time
sys.path.insert(0, ".")
from name_match_latest_spark.session import get_spark
from name_match_latest_spark.operators.graph import pagerank
from pyspark.sql import functions as F

cpus, n_edges, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark("pr-scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=4 * cpus)
spark.sparkContext.setLogLevel("ERROR")
n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
runs, sums = [], []
for _ in range(n_runs):
    spark.catalog.clearCache()
    t0 = time.time()
    r = pagerank(spark.read.parquet(path), iterations=5)
    # CONSUME the rank column (a bare count would let pruning skip the
    # arithmetic): checksum = (sum, count) over the produced ranks
    row = r.agg(F.sum("rank").alias("s"), F.count("*").alias("n")).collect()[0]
    runs.append(time.time() - t0)
    sums.append((row.s, row.n))
spark.stop()
assert len(set(sums)) == 1, sums  # bit-identical across runs
best = min(runs[1:]) if len(runs) > 1 else runs[0]
print(json.dumps({"cpus": cpus, "cold_sec": round(runs[0], 2),
                  "runs_sec": [round(r, 2) for r in runs],
                  "sec": round(best, 2),
                  "edges_per_sec": round(n_edges / best, 1),
                  "rank_sum": sums[0][0], "n_nodes": sums[0][1]}))
"""


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_edges: int, path: str) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_edges), path],
        capture_output=True, text=True, cwd=_repo_root(),
    )
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-2000:])
        raise SystemExit(res.returncode)
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path = os.environ.get(
        "SPARK_GRAFT_PR_EDGES_PATH", f"/tmp/nm_bench_pr_edges_{n_edges}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", GEN, str(n_edges), path],
                       cwd=_repo_root(), check=True, capture_output=True)
    lo = run_level(n, n_edges, path)
    hi = run_level(n * 4, n_edges, path)
    # integer fixed point: the two levels MUST agree bit-for-bit
    assert (lo["rank_sum"], lo["n_nodes"]) == (hi["rank_sum"], hi["n_nodes"]), (
        lo, hi)
    eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / 4.0
    print(json.dumps({
        "job": "pagerank x5 iterations (read edges -> rank -> checksum)",
        "n_edges": n_edges,
        f"local[{n}]": lo,
        f"local[{n * 4}]": hi,
        "speedup": round(hi["edges_per_sec"] / lo["edges_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "identical_ranks": True,
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
