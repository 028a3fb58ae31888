"""Scaling-efficiency evidence (north rule): the SAME web-pipeline job
at two parallelism levels — local[N] and local[4N] — on the SAME input
(the generator is parallelism-invariant), reporting throughput at both
plus efficiency = (T_4N / T_N) / 4.

Each level runs in its own subprocess (a JVM's master is fixed at
startup).  Usage:

    python scripts/bench_scaling.py [n_pages] [N]

Writes results to stdout as one JSON line; record them in BASELINE.md.
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
from name_match_latest_spark.sources.web import generate_webpages

n_pages, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark("gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
generate_webpages(spark, n_pages, seed=42, partitions=64).write.mode(
    "overwrite").parquet(path)
spark.stop()
"""

WORKER = """
import json, sys, time
sys.path.insert(0, ".")
from name_match_latest_spark.session import get_spark
from name_match_latest_spark.plans.web_pipeline import cluster_pages

cpus, n_pages, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# 4 shuffle tasks per core: a single wave (partitions == cores) is
# gated by its slowest partition; 4x gives packing slack, AQE
# coalesces any excess
spark = get_spark("scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=4 * cpus)
spark.sparkContext.setLogLevel("ERROR")
# the measured job is the real pipeline shape: READ the page table from
# storage -> extract -> block -> score -> cluster.  cold run includes
# one-time session costs (python worker fleet, codegen, buffer pools);
# warm run is sustained throughput (what projects to a cluster job).
import os
n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
runs = []
for _ in range(n_runs):
    spark.catalog.clearCache()  # no cross-run cache reuse
    t0 = time.time()
    n = cluster_pages(spark.read.parquet(path)).count()
    runs.append(time.time() - t0)
spark.stop()
# best WARM run: run 0 pays one-time session costs (python worker
# fleet, codegen); the min of the rest is the interference-free
# sustained number on this bursty shared host
best = min(runs[1:]) if len(runs) > 1 else runs[0]
print(json.dumps({"cpus": cpus, "cold_sec": round(runs[0], 2),
                  "runs_sec": [round(r, 2) for r in runs],
                  "sec": round(best, 2),
                  "pages_per_sec": round(n_pages / best, 1), "mentions": n}))
"""


def run_level(cpus: int, n_pages: int, path: str) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_pages), path],
        capture_output=True, text=True, cwd=_repo_root(),
    )
    line = res.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path = os.environ.get("SPARK_GRAFT_PAGES_PATH", f"/tmp/nm_bench_pages_{n_pages}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", GEN, str(n_pages), path],
                       cwd=_repo_root(), check=True, capture_output=True)
    lo = run_level(n, n_pages, path)
    hi = run_level(n * 4, n_pages, path)
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / 4.0
    print(json.dumps({
        "job": "web_pipeline (generate -> extract -> block -> score -> cluster)",
        "n_pages": n_pages,
        f"local[{n}]": lo,
        f"local[{n * 4}]": hi,
        "speedup": round(hi["pages_per_sec"] / lo["pages_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
