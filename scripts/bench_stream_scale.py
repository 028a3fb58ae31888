"""Round-5 scale proof for the streaming ingest gate + incremental
clusterer (VERDICT r4 item #6): a 1M-page corpus drained in 100
micro-batches with near-duplicate floods injected, auto-compaction
wired (no manual maintain()), asserting:

* per-batch wall time stays FLAT as the corpus grows 100x (the
  O(batch + touched) contract — ratio of late-batch to early-batch
  mean duration);
* the label log stays bounded (auto-compaction fires; file count and
  row count reported per trigger);
* the final incremental clusters are IDENTICAL (same partition of
  mentions into entities) to batch-re-clustering the surviving pages.

Prints one JSON line; full per-batch series to
BENCH_STREAM_SCALE.json next to the repo root.

Usage: python scripts/bench_stream_scale.py
Env: STREAM_SCALE_PAGES (default 1_000_000), STREAM_SCALE_BATCHES
(default 100), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_PAGES = int(os.environ.get("STREAM_SCALE_PAGES", "1000000"))
N_BATCHES = int(os.environ.get("STREAM_SCALE_BATCHES", "100"))
DUPS_PER_BATCH = int(os.environ.get("STREAM_SCALE_DUPS", "200"))


def main() -> None:
    from pyspark.sql import functions as F

    from name_match_latest_spark.plans.web_pipeline import cluster_pages
    from name_match_latest_spark.session import get_spark
    from name_match_latest_spark.sources.web import generate_webpages
    from name_match_latest_spark.streaming.incremental_cluster import (
        IncrementalClusterer,
    )

    spark = get_spark(
        "nm-stream-scale",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    cache = f"/tmp/nm_stream_scale_pages_{N_PAGES}"
    if not os.path.isdir(cache):
        generate_webpages(
            spark, N_PAGES, seed=99, partitions=int(CPUS) * 4
        ).withColumn(
            "_idx",
            F.regexp_extract("url", r"/article/(\d+)$", 1).cast("int"),
        ).write.mode("overwrite").parquet(cache)
    pages = spark.read.parquet(cache)
    per_batch = N_PAGES // N_BATCHES

    state_dir = f"/tmp/nm_stream_scale_state_{N_PAGES}_{int(time.time())}"
    # compact_max_files sized to the run's cadence (~40 single-file
    # deltas between folds) so the proof exercises the auto trigger
    # several times; defaults would fold at 256 files just the same
    c = IncrementalClusterer(
        spark,
        state_dir,
        dedup_threshold=0.8,
        compact_factor=3.0,
        compact_max_files=40,
    )

    batch_secs: list[float] = []
    file_counts: list[int] = []
    compactions = 0
    prev_files = 0
    t_all = time.time()
    for b in range(N_BATCHES):
        lo = b * per_batch
        batch = pages.filter(
            (F.col("_idx") >= lo) & (F.col("_idx") < lo + per_batch)
        ).drop("_idx")
        if b > 0 and DUPS_PER_BATCH:
            # flood injection: near-dup mirrors of pages from an
            # EARLIER batch (one appended token — not byte-exact, so
            # they exercise the LSH band path, incl. the capped
            # within-batch star when mirrors repeat within the batch)
            src_lo = (b - 1) * per_batch
            dups = (
                pages.filter(
                    (F.col("_idx") >= src_lo)
                    & (F.col("_idx") < src_lo + DUPS_PER_BATCH)
                )
                .drop("_idx")
                .withColumn(
                    "url",
                    F.concat(F.lit(f"https://mirror{b}.example.com/"), F.col("url")),
                )
                .withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" mirrortok{b}"))
                )
            )
            batch = batch.unionByName(dups)
        t0 = time.time()
        c.process_batch(batch, batch_id=b)
        batch_secs.append(round(time.time() - t0, 2))
        n_files = len(c.labels._file_paths(c.labels.current_snapshot()))
        if n_files < prev_files:
            compactions += 1
        prev_files = n_files
        file_counts.append(n_files)
        if (b + 1) % 10 == 0:
            print(
                f"# batch {b + 1}/{N_BATCHES}: {batch_secs[-1]}s, "
                f"label files={n_files}, compactions={compactions}",
                file=sys.stderr,
                flush=True,
            )
    wall = time.time() - t_all

    n_docs = c.docs.read(spark).count()
    n_mentions = c.mentions.read(spark).count()
    log_rows = c.labels.total_rows()

    # flatness: late-window mean over early-window mean (window of 10
    # batches, skipping batch 0 which has no corpus side)
    early = sum(batch_secs[1:11]) / 10
    late = sum(batch_secs[-10:]) / 10
    flatness = round(late / early, 3)

    # cluster equality vs batch re-clustering of the SURVIVING pages.
    # The fed universe = originals + every injected mirror (rebuilt
    # here with the same column expressions as the injection) — a
    # mirror that slips past the gate (rare LSH miss) must appear in
    # the batch-side comparison too, not silently diverge it.
    survivors = c.docs.read(spark).select(F.col("doc_id").alias("url"))
    b_col = ((F.col("_idx") / per_batch).cast("int") + 1).cast("string")
    mirrors_all = (
        pages.filter((F.col("_idx") % per_batch) < DUPS_PER_BATCH)
        .filter(F.col("_idx") < (N_BATCHES - 1) * per_batch)
        .select(
            F.concat(
                F.lit("https://mirror"), b_col, F.lit(".example.com/"), F.col("url")
            ).alias("url"),
            "warc_ts",
            "html",
            F.concat(F.col("text"), F.lit(" mirrortok"), b_col).alias("text"),
            "lang",
            "true_entities",
        )
    )
    fed = pages.drop("_idx").unionByName(mirrors_all)
    surviving_pages = fed.join(survivors, "url", "left_semi")
    want = cluster_pages(surviving_pages)
    got = c.cluster_members()
    # partition equality via canonical min-member labels: the
    # (member -> min-member-of-cluster) relation is identical iff the
    # partitions are; compare an order-independent hash-sum of it
    # (distributed — no driver-side materialization of 2.5M rows)
    def partition_hash(df):
        w = df.groupBy("cluster_id").agg(F.min("id").alias("_canon"))
        rel = df.join(w, "cluster_id").select(
            F.xxhash64(
                F.concat_ws("|", F.col("id").cast("string"), F.col("_canon").cast("string"))
            ).alias("h")
        )
        # decimal sum: 2.5M int64 terms overflow a long under ANSI
        return rel.agg(F.sum(F.col("h").cast("decimal(38,0)"))).first()[0]

    h_got = partition_hash(got)
    h_want = partition_hash(want)
    clusters_equal = h_got == h_want

    out = {
        "metric": "stream_scale_1m",
        "n_pages": N_PAGES,
        "n_batches": N_BATCHES,
        "dups_injected_per_batch": DUPS_PER_BATCH,
        "wall_sec": round(wall, 1),
        "pages_per_sec": round(N_PAGES / wall, 1),
        "n_docs_surviving": n_docs,
        "n_mentions": n_mentions,
        "label_log_rows": log_rows,
        "label_files_max": max(file_counts),
        "compactions": compactions,
        "batch_sec_early_mean": round(early, 2),
        "batch_sec_late_mean": round(late, 2),
        "flatness_late_over_early": flatness,
        "clusters_equal_batch": clusters_equal,
        "cpus": int(CPUS),
    }
    detail = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STREAM_SCALE.json",
    )
    with open(detail, "w") as f:
        json.dump(
            {**out, "batch_secs": batch_secs, "label_file_counts": file_counts},
            f,
            indent=1,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
