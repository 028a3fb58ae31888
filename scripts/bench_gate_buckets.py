"""Measure the ingest gate's corpus-side scan term with and without
Iceberg-style corpus bucketing (round 5: the documented production
answer to the gate's O(corpus)-per-batch growth, BASELINE.md round-5
decomposition — docs text fetch / docs_bands equi-join).

Protocol: for each corpus size C, seed the gate's state tables
directly (same rows the gate itself would have committed: docs +
minhash band assignments, bucketed or not), then drive T small ticks
(fresh pages + a few injected near-dup mirrors of corpus rows) through
``IncrementalClusterer._dedup_gate`` and record per-tick wall time.
The favorable regime is deliberate and documented in the operator's
docstring: SMALL ticks against a LARGE corpus — candidate ids occupy
few doc buckets, so the heavy text-column fetch prunes hard, while a
backfill-sized batch would touch every bucket and win nothing.

Prints one compact JSON line; full per-tick series + file-count /
read-amplification evidence to BENCH_GATE_BUCKETS.json at repo root.

Usage: python scripts/bench_gate_buckets.py
Env: GATE_CORPUS_SIZES (default "200000,1000000"), GATE_TICKS (20),
GATE_TICK_ROWS (100), GATE_TICK_MIRRORS (10), GATE_BUCKETS (64),
SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SIZES = [
    int(s)
    for s in os.environ.get("GATE_CORPUS_SIZES", "200000,1000000").split(",")
]
TICKS = int(os.environ.get("GATE_TICKS", "20"))
TICK_ROWS = int(os.environ.get("GATE_TICK_ROWS", "100"))
TICK_MIRRORS = int(os.environ.get("GATE_TICK_MIRRORS", "10"))
BUCKETS = int(os.environ.get("GATE_BUCKETS", "64"))


def main() -> None:
    from pyspark.sql import functions as F

    from name_match_latest_spark.operators.dedup import minhash_bands
    from name_match_latest_spark.session import get_spark
    from name_match_latest_spark.sources.web import generate_webpages
    from name_match_latest_spark.streaming.incremental_cluster import (
        IncrementalClusterer,
    )

    spark = get_spark(
        "nm-gate-buckets",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    detail: dict = {
        "sizes": SIZES,
        "ticks": TICKS,
        "tick_rows": TICK_ROWS,
        "tick_mirrors": TICK_MIRRORS,
        "buckets": BUCKETS,
        "cpus": int(CPUS),
        "variants": {},
    }
    summary: dict = {}

    for corpus_n in SIZES:
        # corpus rows exactly as the gate stores them (sources/web
        # generator, distinct texts) — shared across both variants
        pages = generate_webpages(
            spark, corpus_n, seed=131, partitions=int(CPUS)
        )
        seed_docs = pages.select(
            F.col("url").alias("doc_id"),
            "text",
            "lang",
            F.md5("text").alias("text_hash"),
        ).localCheckpoint(eager=True)
        seed_bands = minhash_bands(seed_docs).localCheckpoint(eager=True)
        mirrors_src = seed_docs.orderBy("doc_id").limit(
            TICK_MIRRORS * TICKS
        ).collect()

        cs = {}
        seed_compacts = {}
        for variant, nb in (("plain", None), ("bucketed", BUCKETS)):
            state = f"/tmp/nm_gate_buckets_{corpus_n}_{variant}"
            shutil.rmtree(state, ignore_errors=True)
            c = IncrementalClusterer(
                spark, state, dedup_threshold=0.8, corpus_buckets=nb
            )
            d, b = seed_docs, seed_bands
            if nb is not None:
                d = d.withColumn("doc_key", F.crc32("doc_id"))
                b = b.withColumn("band_key", F.crc32("band_hash"))
            # seed appends flat (the production write path), then one
            # compaction establishes the bucketed base layout
            c.docs.append(d, batch_id=0, query_id="default:docs")
            c.docs_bands.append(b, batch_id=0, query_id="default:docs_bands")
            t0 = time.time()
            c.compact_corpus()
            seed_compacts[variant] = round(time.time() - t0, 3)
            cs[variant] = c

        # PAIRED interleaved ticks: both variants run the SAME tick
        # back-to-back (order alternating) so bursty external host
        # load hits both equally — the per-tick DELTA is the signal,
        # robust to the drift that confounds sequential runs
        tick_secs = {"plain": [], "bucketed": []}
        compact_secs = {"plain": [], "bucketed": []}
        survivors = {"plain": 0, "bucketed": 0}
        for t in range(TICKS):
            fresh = generate_webpages(
                spark, TICK_ROWS, seed=900 + corpus_n * 7 + t
            ).select(
                # generator urls are a function of page_id only —
                # prefix per tick so tick urls never collide with
                # the corpus or each other
                F.concat(
                    F.lit(f"https://tick{t}.example.com/"), F.col("url")
                ).alias("url"),
                "text",
                "lang",
            )
            mrows = [
                (
                    f"https://mirror{t}.example.com/a/{i}",
                    r.text + " extraword",
                    r.lang,
                )
                for i, r in enumerate(
                    mirrors_src[t * TICK_MIRRORS : (t + 1) * TICK_MIRRORS]
                )
            ]
            tick = fresh.unionByName(
                spark.createDataFrame(mrows, "url string, text string, lang string")
            ).localCheckpoint(eager=True)
            order = ("plain", "bucketed") if t % 2 == 0 else ("bucketed", "plain")
            for variant in order:
                c = cs[variant]
                t0 = time.time()
                surv = c._dedup_gate(tick, batch_id=t + 1, lineage="default")
                n = surv.count()
                tick_secs[variant].append(time.time() - t0)
                t0 = time.time()
                c._maybe_compact()
                compact_secs[variant].append(time.time() - t0)
                survivors[variant] += n

        deltas = sorted(
            b - p for p, b in zip(tick_secs["plain"], tick_secs["bucketed"])
        )
        for variant in ("plain", "bucketed"):
            key = f"{variant}_{corpus_n}"
            c = cs[variant]
            ts = tick_secs[variant]
            docs_files = len(c.docs._file_paths(c.docs.current_snapshot()))
            detail["variants"][key] = {
                "tick_secs": [round(x, 3) for x in ts],
                "seed_compact_sec": seed_compacts[variant],
                "maybe_compact_secs": [
                    round(x, 3) for x in compact_secs[variant]
                ],
                "survivors_total": survivors[variant],
                "docs_files": docs_files,
                "checksum": c.docs.read(spark)
                .agg(F.sum(F.crc32("doc_id")).alias("s"))
                .collect()[0].s,
            }
            summary[key] = round(sorted(ts)[len(ts) // 2], 3)  # median
        summary[f"delta_median_{corpus_n}"] = round(
            deltas[len(deltas) // 2], 3
        )  # median paired (bucketed - plain) tick delta

        # identical gate decisions across layouts at this size
        pk, bk = f"plain_{corpus_n}", f"bucketed_{corpus_n}"
        assert (
            detail["variants"][pk]["checksum"]
            == detail["variants"][bk]["checksum"]
        ), "layouts diverged"
        assert (
            detail["variants"][pk]["survivors_total"]
            == detail["variants"][bk]["survivors_total"]
        )

    # read-amplification evidence at the largest size: files opened by
    # the pruned candidate-text fetch vs the full corpus read
    big = SIZES[-1]
    c = IncrementalClusterer(
        spark,
        f"/tmp/nm_gate_buckets_{big}_bucketed",
        dedup_threshold=0.8,
        corpus_buckets=BUCKETS,
    )
    one = c.docs.read(spark).select("doc_id").limit(1)
    pruned_files = len(
        c.docs.read_buckets(
            spark, c._touched_buckets(one, "doc_id")
        ).inputFiles()
    )
    full_files = len(c.docs.read(spark).inputFiles())
    detail["read_amplification"] = {
        "probe_docs": 1,
        "pruned_files": pruned_files,
        "full_files": full_files,
    }

    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_GATE_BUCKETS.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "gate_tick_median_sec",
                "median_tick_sec": summary,
                "read_amp": f"{pruned_files}/{full_files}",
                "unit": "sec",
            }
        )
    )


if __name__ == "__main__":
    main()
