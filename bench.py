"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE COMPACT JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...}

The stdout line stays small on purpose: the driver captures a bounded
tail of output, and round 4's line (which inlined every raw run time)
outgrew that window — the driver recorded ``"parsed": null``.  The
full evidence payload (all raw run times per query, result row counts)
goes to the ``BENCH_DETAIL.json`` sidecar next to this script instead.

Scaling-efficiency evidence (north rule) lives in
scripts/bench_scaling.py which runs the SAME web job at two
parallelism levels; its results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "40000"))


def main() -> None:
    from name_match_latest_spark.driver_queries import SPARK_QUERIES
    from name_match_latest_spark.session import get_spark

    spark = get_spark(
        "nm-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "algo1",            # deterministic equi-join
        "algo2",
        "algo3_full",       # blocked fuzzy + full cascade (with middle)
        "algo4_full",       # birthdate-blocked fuzzy (no middle)
        "algo4_alt",        # algo3-style blocking on no-middle cascade (round 4)
        "algo7",            # OR-blocked lev-weighted
        "cascade_l1",
        "cascade_l10",
        "cascade_l11",      # no-middle fuzzy level, swap forced off (round 4)
        "households_opt5",  # window argmax + group agg
        "entity_clusters",  # connected components
        "dedup_minhash_lsh",
        "dedup_token_jaccard",
        "dedup_ngram_jaccard",  # round 3
        "dedup_cluster_reps",   # near-dup CC + canonical rep (round 4)
        "text_quality",
        "ann_topk",
        "ann_topk_l2",      # Euclidean metric (round 4)
        "ann_ivf",              # round 3
        "agg_pricing",
        "window_argmax",
        "events_hourly",
        "events_sessionize",    # round 5: gap sessionization, 1 exchange
        "events_asof_join",     # round 5: as-of join vs native DuckDB ASOF
        "events_range_join",    # round 5: bucketed interval join, no BNLJ
        "web_domain_stats",     # round 5: crawl profiling over real extraction
        "media_meta",           # round 5: JVM header-dims metadata scan
        "block_guard_stats",    # round 5: guard + histogram observability
        "graph_pagerank",       # round 5: fixed-point integer PageRank
        "tfidf_top_terms",      # round 5: libm-exact TF-IDF top-k
        "bigram_collocations",  # round 5: lift-ranked collocations
        "corpus_stratified_sample",  # round 5: md5-bucket downsample
        "corpus_split_assign",       # round 5: train/val/test ranges
        "corpus_temperature_sample", # round 5: p^alpha language rebalance
        "split_decontam",            # round 5: n-gram contamination
        "embedding_label_centroids", # round 5: fixed-point centroids
        "token_repetition",          # round 5: Gopher repetition stats
        "boilerplate_ngrams",        # round 5: corpus-wide shared n-grams
        "quality_linear_score",      # round 5: hashed-feature classifier
        "semantic_dedup",            # round 5: SemDeDup within-cell cosine
        "lm_bigram_nll",             # round 5: fixed-point LM perplexity
        "bpe_merges",                # round 5: tokenizer merge learning (8 seq rounds)
        # graph_triangles is oracle+pytest-gated but NOT a headline
        # member: the sf0.1 co-supplier graph is near-complete (1000
        # nodes / 453,588 of 499,500 possible edges), so the triangle
        # workload is inherently cubic-ish there — a stress shape, not
        # a latency benchmark.
    ]

    # warm the session (python worker fleet, codegen, buffer pools) so
    # the first timed query doesn't absorb one-time startup costs —
    # including a small web-pipeline run, since that suite member now
    # goes FIRST
    from name_match_latest_spark.plans.web_pipeline import cluster_pages
    from name_match_latest_spark.sources.web import generate_webpages

    SPARK_QUERIES["algo1"](spark, "/root/testdata/sf0.001").count()
    SPARK_QUERIES["algo3_full"](spark, "/root/testdata/sf0.001").count()
    cluster_pages(
        generate_webpages(spark, 2000, seed=7, partitions=int(CPUS))
    ).count()
    spark.catalog.clearCache()

    # best-of-2 per query, ALL raw run times emitted under "runs": this
    # sandbox is a shared host with bursty CPU steal (observed 2-3x
    # swings on IDENTICAL plans minutes apart); the min is the
    # interference-free measure of plan quality and the spread is the
    # recorded noise evidence
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    all_runs: dict[str, list[float]] = {}

    def timed(name, fn, n_runs: int = 2) -> None:
        runs = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            rows[name] = fn()
            runs.append(round(time.time() - t0, 3))
        all_runs[name] = runs
        timings[name] = min(runs)

    # web pipeline FIRST — measured on a fresh-but-warmed session
    # instead of after 19 queries of cache/GC pressure: pages ->
    # mentions -> blocked fuzzy match -> clusters
    timed(
        "web_pipeline",
        lambda: cluster_pages(
            generate_webpages(spark, N_PAGES, seed=42, partitions=int(CPUS))
        ).count(),
    )

    for name in headline:
        fn = SPARK_QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).count())

    # duplicate-heavy LSH: 50 docs replicated 200x on top of the corpus.
    # The auto bucket cap must keep the candidate join bounded (uncapped
    # this is ~4M crowd pairs for dups exact_dedup already catches);
    # the row count printed alongside is the evidence.
    from pyspark.sql import functions as F

    from name_match_latest_spark.operators.dedup import minhash_lsh_candidates

    # doc_id as STRING on both sides: replica ids are "<id>_<rep>", and
    # an ANSI union of bigint+string would cast the replicas to BIGINT
    # and fail at runtime
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "lang"
    )
    crowd = (
        docs.orderBy("doc_id").limit(50)
        .crossJoin(spark.range(200).select(F.col("id").alias("_rep")))
        .select(
            F.concat_ws("_", "doc_id", "_rep").alias("doc_id"), "text", "lang"
        )
    )
    dup_corpus = docs.unionByName(crowd)
    timed(
        "dedup_minhash_dupheavy",
        lambda: minhash_lsh_candidates(dup_corpus).count(),
    )

    web_sec = timings["web_pipeline"]
    n_clustered = rows["web_pipeline"]
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pages_per_sec": round(N_PAGES / web_sec, 1),
        "mentions_per_sec": round(n_clustered / web_sec, 1),
        "cpus": int(CPUS),
        "n_pages": N_PAGES,
        "detail": "BENCH_DETAIL.json",
    }
    # full evidence sidecar: every raw run time (the host-noise spread
    # record) + per-query result row counts — everything the compact
    # stdout line omits
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump({**out, "runs": all_runs, "rows": rows}, f, indent=1)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
