"""Scale evidence for the round-5 event operators: sessionize +
as-of join at two parallelism levels on the SAME deterministic input
(north-rule protocol — no real cluster in this sandbox, so local[N]
vs local[4N] stands in for N vs 4N executors).

The synthetic log is generated column-wise from spark.range (pure
Column exprs, parallelism-invariant): ~n/4000 users, event times
spread over 90 days with md5-derived jitter, 1/8 of events are
'error'.  Each level runs in its own subprocess (a JVM's master is
fixed at startup), best-of-N warm runs per the host-noise protocol.

Usage:  python scripts/bench_events_scale.py [n_events] [N]
Writes one JSON line; record results in BASELINE.md.
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

n, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark("gen-events", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, n, 1, 64).select(F.col("id").alias("event_id"))
df = df.withColumns({
    "user_id": F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("u"), F.col("event_id"))), 1, 12), 16, 10).cast("long"),
        F.lit(max(1, n // 4000)),
    ),
    "_jit": F.conv(F.substring(F.md5(F.concat(F.lit("t"), F.col("event_id"))), 1, 12), 16, 10).cast("long"),
})
df = df.withColumns({
    "ts": F.timestamp_add(
        "SECOND",
        F.pmod(F.col("_jit"), F.lit(90 * 86400)),
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
    ),
    "event_type": F.when(F.pmod(F.col("_jit"), F.lit(8)) == 0, "error").otherwise("click"),
    "value": (F.pmod(F.col("_jit"), F.lit(10000)) / 100.0),
}).drop("_jit")
df.write.mode("overwrite").parquet(path)
spark.stop()
"""

WORKER = """
import json, os, sys, time
sys.path.insert(0, ".")
from name_match_latest_spark.session import get_spark
from name_match_latest_spark.operators.events import asof_join, session_stats
from pyspark.sql import functions as F

cpus, path = int(sys.argv[1]), sys.argv[2]
spark = get_spark("events-scale-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=4 * cpus)
spark.sparkContext.setLogLevel("ERROR")
n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))

def job():
    ev = spark.read.parquet(path)
    s = session_stats(ev)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = (ev.filter(F.col("event_type") == "error")
                .groupBy("user_id", F.col("ts").alias("err_ts"))
                .agg(F.max("value").alias("err_value")))
    j = asof_join(clicks, errors, on="user_id", left_ts="ts", right_ts="err_ts")
    # consume the matched payload: a bare count() lets Catalyst prune
    # the window entirely (cardinality-preserving op, unused columns)
    # and measures only the scan
    n_s = s.count()
    n_j = j.agg(
        F.count("*").alias("n"), F.count("err_value").alias("nm")
    ).collect()[0]
    return n_s, (n_j.n, n_j.nm)

runs, counts = [], None
for _ in range(n_runs):
    spark.catalog.clearCache()
    t0 = time.time()
    counts = job()
    runs.append(time.time() - t0)
spark.stop()
print(json.dumps({"cpus": cpus, "runs": runs, "best": min(runs),
                  "n_sessions": counts[0], "n_asof_rows": counts[1]}))
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path = f"/tmp/nm_bench_events_{n}"
    env = {**os.environ, "PYTHONPATH": "."}
    if not os.path.exists(path + "/_SUCCESS"):
        subprocess.run(
            [sys.executable, "-c", GEN, str(n), path], check=True, env=env
        )
    out = {}
    for cpus in (base, base * 4):
        r = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), path],
            check=True,
            env=env,
            capture_output=True,
            text=True,
        )
        out[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
    lo, hi = out[base], out[base * 4]
    assert lo["n_sessions"] == hi["n_sessions"]
    assert lo["n_asof_rows"] == hi["n_asof_rows"]
    eff = (lo["best"] / hi["best"]) / 4
    print(
        json.dumps(
            {
                "n_events": n,
                "levels": out,
                "events_per_sec_lo": round(n / lo["best"], 1),
                "events_per_sec_hi": round(n / hi["best"], 1),
                "speedup": round(lo["best"] / hi["best"], 3),
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
