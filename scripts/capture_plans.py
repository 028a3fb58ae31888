"""Capture .explain("formatted") for declared queries into a directory.

Usage: python scripts/capture_plans.py <out_dir> [query ...]

Writes <out_dir>/<query>.txt for each query (default: the bench.py
headline list + web_pipeline).  NOTE: some query builders execute
Spark jobs during CONSTRUCTION (bpe_train's per-round argmax collect,
pagerank's node count) — capturing their plan runs those stages; the
captured plan is the final returned DataFrame's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "algo1", "algo2", "algo3_full", "algo4_full", "algo4_alt", "algo7",
    "cascade_l1", "cascade_l10", "cascade_l11", "households_opt5",
    "entity_clusters", "dedup_minhash_lsh", "dedup_token_jaccard",
    "dedup_ngram_jaccard", "dedup_cluster_reps", "text_quality",
    "ann_topk", "ann_topk_l2", "ann_ivf", "agg_pricing", "window_argmax",
    "events_hourly", "events_sessionize", "events_asof_join",
    "events_range_join", "web_domain_stats", "media_meta",
    "block_guard_stats", "graph_pagerank", "tfidf_top_terms",
    "bigram_collocations", "corpus_stratified_sample", "corpus_split_assign",
    "corpus_temperature_sample", "split_decontam",
    "embedding_label_centroids", "token_repetition", "boilerplate_ngrams",
    "quality_linear_score", "semantic_dedup", "lm_bigram_nll", "bpe_merges",
]


def main() -> None:
    from name_match_latest_spark.driver_queries import SPARK_QUERIES
    from name_match_latest_spark.session import get_spark

    out_dir = sys.argv[1]
    names = sys.argv[2:] or HEADLINE + ["web_pipeline"]
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        "nm-plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        try:
            if name == "web_pipeline":
                from name_match_latest_spark.plans.web_pipeline import (
                    cluster_pages,
                )
                from name_match_latest_spark.sources.web import (
                    generate_webpages,
                )

                df = cluster_pages(
                    generate_webpages(spark, 2000, seed=7, partitions=int(CPUS))
                )
            else:
                df = SPARK_QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # keep going; record the error
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
