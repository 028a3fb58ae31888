"""Measure the brute-force top-k metric engines against each other
(VERDICT r4 item #7): JVM higher-order-function fold (interpreted,
CodegenFallback) vs the numpy/Arrow partial-top-k path — same results
bit-exactly (tests/test_annsearch_arrow.py), so this is purely a
throughput question at large query counts.

Deterministic synthetic embeddings (md5-seeded, generated
distributed); prints one JSON line per (n_corpus, n_queries, metric,
impl) with wall seconds.  Results recorded in docs/PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DIM = 64


def gen_embeddings(spark, n: int, salt: str):
    """n deterministic 64-dim vectors: element = md5-derived uniform
    in [-1, 1) — pure Column expr, distributed."""
    from pyspark.sql import functions as F

    cols = [
        (
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col("id"), F.lit(d))), 1, 8),
                    16,
                    10,
                ).cast("double")
                / F.lit(float(2**32))
            )
            * 2.0
            - 1.0
        ).cast("float")
        for d in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def main() -> None:
    from name_match_latest_spark.operators.annsearch import cosine_topk, l2_topk
    from name_match_latest_spark.session import get_spark

    spark = get_spark(
        "nm-ann-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_corpus = int(os.environ.get("ANN_BENCH_CORPUS", "20000"))
    corpus = gen_embeddings(spark, n_corpus, "corpus").repartition(
        int(CPUS)
    ).localCheckpoint(eager=True)

    # warm BOTH engines (the default flip made the bare call arrow —
    # the hof leg must not absorb one-time JVM/codegen costs)
    cosine_topk(corpus.limit(500), corpus.limit(20), k=5, impl="hof").count()
    cosine_topk(corpus.limit(500), corpus.limit(20), k=5, impl="arrow").count()

    results = []
    for n_q in (1000, 10000):
        queries = corpus.limit(n_q).localCheckpoint(eager=True)
        for metric, fn in (("cosine", cosine_topk), ("l2", l2_topk)):
            for impl in ("hof", "arrow"):
                best = None
                for _ in range(2):
                    t0 = time.time()
                    n = fn(corpus, queries, k=10, impl=impl).count()
                    dt = round(time.time() - t0, 2)
                    best = dt if best is None else min(best, dt)
                rec = {
                    "n_corpus": n_corpus,
                    "n_queries": n_q,
                    "metric": metric,
                    "impl": impl,
                    "sec": best,
                    "rows": n,
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
