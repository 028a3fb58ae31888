"""Scaling-efficiency evidence for the PERSON-FUZZY path (Algo 3):
the same blocked fuzzy match at two parallelism levels — local[N] and
local[4N] — on the same two materialized person tables, reporting
probe-rows/sec at both plus efficiency = speedup / 4.

This is the headline capability claim vs the reference, which
hard-blocks fuzzy/cascade matching at >= 1M rows per side
(run_service/scale.rs:8-10): here both sides are 5M rows by default.

Each level runs in its own subprocess (a JVM's master is fixed at
startup); min-of-N warm runs per level (SPARK_GRAFT_SCALING_RUNS,
default 3) — this host has bursty CPU steal, the min is the
interference-free measure of plan quality.  Usage:

    python scripts/bench_scaling_persons.py [n_rows] [N]

Writes one JSON line to stdout; record it in BASELINE.md.
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
from name_match_latest_spark.sources.synth import generate_persons_distributed

n, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark("gen-persons", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
for side in ("a", "b"):
    generate_persons_distributed(spark, n, side, partitions=64).write.mode(
        "overwrite").parquet(f"{path}/{side}")
spark.stop()
"""

WORKER = """
import json, os, sys, time
sys.path.insert(0, ".")
from name_match_latest_spark.session import get_spark
from name_match_latest_spark.operators.algos import match_fuzzy
from name_match_latest_spark.operators.persons import prepare_persons
from name_match_latest_spark.plans.caching import unpersist_tracked

cpus, n_rows, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# 4 shuffle tasks per core: a single wave (partitions == cores) is
# gated by its slowest partition; 4x gives the scheduler packing slack
# and AQE coalesces any excess — the same 2-4x/core rule a real
# cluster job uses
spark = get_spark("scaling-persons-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=4 * cpus)
spark.sparkContext.setLogLevel("ERROR")
n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
runs = []
for _ in range(n_runs):
    spark.catalog.clearCache()
    unpersist_tracked()
    t0 = time.time()
    # the real pipeline shape: read raw tables from storage -> prepare
    # (normalize + phonetics, the per-person UDF pass) -> blocked fuzzy
    # match with fallback tiers -> scored matches
    t1 = prepare_persons(spark.read.parquet(f"{path}/a"))
    t2 = prepare_persons(spark.read.parquet(f"{path}/b"))
    n_matches = match_fuzzy(t1, t2).count()
    runs.append(time.time() - t0)
spark.stop()
best = min(runs[1:]) if len(runs) > 1 else runs[0]
print(json.dumps({"cpus": cpus, "cold_sec": round(runs[0], 2),
                  "runs_sec": [round(r, 2) for r in runs],
                  "sec": round(best, 2),
                  "probe_rows_per_sec": round(n_rows / best, 1),
                  "matches": n_matches}))
"""


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_rows: int, path: str) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_rows), path],
        capture_output=True, text=True, cwd=_repo_root(),
    )
    line = res.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path = os.environ.get(
        "SPARK_GRAFT_PERSONS_PATH", f"/tmp/nm_bench_persons_{n_rows}"
    )
    if not os.path.exists(os.path.join(path, "b", "_SUCCESS")):
        subprocess.run([sys.executable, "-c", GEN, str(n_rows), path],
                       cwd=_repo_root(), check=True, capture_output=True)
    lo = run_level(n, n_rows, path)
    hi = run_level(n * 4, n_rows, path)
    eff = (hi["probe_rows_per_sec"] / lo["probe_rows_per_sec"]) / 4.0
    print(json.dumps({
        "job": "algo3 fuzzy match (read -> prepare -> blocked fuzzy + fallback tiers -> score)",
        "n_rows_per_side": n_rows,
        f"local[{n}]": lo,
        f"local[{n * 4}]": hi,
        "speedup": round(hi["probe_rows_per_sec"] / lo["probe_rows_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
