"""Bigram-LM scoring scaling evidence: the SAME lm_bigram_nll job at
two parallelism levels — local[N] vs local[4N] — on the SAME stored
document table, reporting throughput at both plus
efficiency = speedup / 4 (the north rule's two-cluster-size protocol,
emulated by parallelism levels in this single-box sandbox; N=2 keeps
both levels under-subscribed on the 32-core box — see docs/SCALE.md
"Why local[2] vs local[8]").

Documents are deterministic word soup over a ~5k-token vocabulary with
a mild frequency bias (the df-spread-with-some-skew key distribution a
real corpus gives the training aggregates).  Because every per-doc
score is an INTEGER sum of quantized ln values, the corpus-wide
checksum (sum nll_fx, sum n_bigrams, count) must be bit-identical
across runs AND levels — asserted: the partitioning-invariance proof
at 200x the pytest corpus.

Usage:
    python scripts/bench_lm_scale.py [n_docs] [N]

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

n_docs, path = int(sys.argv[1]), sys.argv[2]
VOCAB, TOKS = 5000, 60
spark = get_spark("gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
toks = F.transform(
    F.sequence(F.lit(0), F.lit(TOKS - 1)),
    lambda i: F.concat(
        F.lit("tok"),
        F.pmod(
            F.pmod(F.xxhash64(F.col("id"), i), F.lit(VOCAB))
            * F.pmod(F.xxhash64(F.col("id"), i, F.lit(7)), F.lit(89)),
            F.lit(VOCAB),
        ),
    ),
)
d = spark.range(n_docs, numPartitions=64).select(
    F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text"))
d.write.mode("overwrite").parquet(path)
spark.stop()
"""

WORKER = """
import json, os, sys, time
sys.path.insert(0, ".")
from name_match_latest_spark.session import get_spark
from name_match_latest_spark.operators.textstats import lm_bigram_nll
from pyspark.sql import functions as F

cpus, n_docs, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark("lm-scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=4 * cpus)
spark.sparkContext.setLogLevel("ERROR")
n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
runs, sums = [], []
for _ in range(n_runs):
    spark.catalog.clearCache()
    t0 = time.time()
    out = lm_bigram_nll(spark.read.parquet(path))
    # CONSUME the scores via the integer checksum (a bare count would
    # let pruning skip the model entirely)
    row = out.agg(F.sum("nll_fx").alias("s"), F.sum("n_bigrams").alias("b"),
                  F.count("*").alias("n")).collect()[0]
    runs.append(time.time() - t0)
    sums.append((row.s, row.b, row.n))
spark.stop()
assert len(set(sums)) == 1, sums  # bit-identical across runs
best = min(runs[1:]) if len(runs) > 1 else runs[0]
print(json.dumps({"cpus": cpus, "cold_sec": round(runs[0], 2),
                  "runs_sec": [round(r, 2) for r in runs],
                  "sec": round(best, 2),
                  "docs_per_sec": round(n_docs / best, 1),
                  "nll_fx_sum": sums[0][0], "n_bigrams": sums[0][1],
                  "n_docs": sums[0][2]}))
"""


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_docs: int, path: str) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_docs), path],
        capture_output=True, text=True, cwd=_repo_root(),
    )
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-2000:])
        raise SystemExit(res.returncode)
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    path = os.environ.get(
        "SPARK_GRAFT_LM_DOCS_PATH", f"/tmp/nm_bench_lm_docs_{n_docs}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", GEN, str(n_docs), path],
                       cwd=_repo_root(), check=True, capture_output=True)
    lo = run_level(n, n_docs, path)
    hi = run_level(n * 4, n_docs, path)
    # integer fixed point: the two levels MUST agree bit-for-bit
    assert (lo["nll_fx_sum"], lo["n_bigrams"], lo["n_docs"]) == (
        hi["nll_fx_sum"], hi["n_bigrams"], hi["n_docs"]), (lo, hi)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    print(json.dumps({
        "job": "lm_bigram_nll (train + score + integer checksum)",
        "n_docs": n_docs,
        f"local[{n}]": lo,
        f"local[{n * 4}]": hi,
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "identical_scores": True,
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
