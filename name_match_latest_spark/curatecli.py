"""Corpus-curation command line: documents -> filtered, sampled,
split, decontaminated training corpus.

    python -m name_match_latest_spark.curatecli DOCS OUT_DIR
        [--master URL]
        [--min-tokens N]                  quality floor (drop shorter docs)
        [--max-dup-frac 0.55]             repetition gate: max duplicate-token
        [--max-bigram-frac 0.12]            fraction / top-bigram char fraction
        [--sample en=0.5,de=1.0 | --temperature-budget 0.5]
        [--default-rate 0.1] [--seed cs42]
        [--split train=0.8,val=0.1,test=0.1]
        [--decontam-ngram 3 | --no-decontam]

Writes OUT_DIR/corpus (the kept docs + split column, partitioned by
split) and OUT_DIR/decontam (per-test-doc n-gram contamination vs the
train split), and prints a one-line JSON summary.

Every decision is content-keyed md5 arithmetic (operators/sampling.py)
— bit-reproducible across engines, reruns, partitionings, and
incremental re-ingests — so rerunning over a grown corpus never
reassigns an old document.  All stages are declarative DataFrame
plans: `--master spark://...` scales the identical job to a cluster
(the north rule's spark-submit mode).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

__all__ = ["main", "run"]


def _parse_rates(s: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in s.split(","):
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def run(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="name_match_latest_spark.curatecli")
    p.add_argument("input", help="documents parquet dir (doc_id, text, lang)")
    p.add_argument("out_dir")
    p.add_argument("--master", default=None)
    p.add_argument("--min-tokens", type=int, default=0,
                   help="drop docs with fewer whitespace tokens")
    p.add_argument("--max-dup-frac", type=float, default=None,
                   help="drop docs whose duplicate-token fraction exceeds this")
    p.add_argument("--max-bigram-frac", type=float, default=None,
                   help="drop docs whose top-bigram character fraction exceeds this")
    p.add_argument("--sample", default=None,
                   help="per-lang keep rates, e.g. en=0.5,de=1.0")
    p.add_argument("--temperature-budget", type=float, default=None,
                   help="alpha=0.5 temperature rebalance to this corpus "
                        "fraction (data-derived per-lang rates; "
                        "mutually exclusive with --sample)")
    p.add_argument("--default-rate", type=float, default=1.0)
    p.add_argument("--seed", default="cs42")
    p.add_argument("--split", default="train=0.8,val=0.1,test=0.1")
    p.add_argument("--decontam-ngram", type=int, default=3)
    p.add_argument("--no-decontam", action="store_true")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    from pyspark.sql import functions as F

    from .operators.decontam import cross_split_contamination
    from .operators.sampling import split_assign, stratified_sample
    from .session import get_spark

    spark = get_spark("nm-curate", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    if args.max_dup_frac is not None or args.max_bigram_frac is not None:
        # Gopher-style repetition gate; subsumes the token floor (the
        # gate's tokenizer lowercases, which cannot change the count).
        # A threshold of 1.0 disables that rule (frac <= 1.0 always).
        from .operators.repetition import repetition_quality_gate

        kept_ids = repetition_quality_gate(
            docs,
            min_tokens=args.min_tokens,
            max_dup_token_frac=(
                args.max_dup_frac if args.max_dup_frac is not None else 1.0
            ),
            max_top_bigram_frac=(
                args.max_bigram_frac if args.max_bigram_frac is not None else 1.0
            ),
        ).select("doc_id")
        docs = docs.join(kept_ids, "doc_id", "left_semi")
    elif args.min_tokens > 0:
        n_tok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
        docs = docs.where(n_tok >= args.min_tokens)

    if args.sample and args.temperature_budget is not None:
        p.error("--sample and --temperature-budget are mutually exclusive")
    if args.sample:
        docs = stratified_sample(
            docs, "lang", _parse_rates(args.sample), "doc_id",
            seed=args.seed, default_rate=args.default_rate,
        )
    elif args.temperature_budget is not None:
        from .operators.sampling import temperature_sample

        docs = temperature_sample(
            docs, args.temperature_budget, seed=args.seed
        )

    weights = _parse_rates(args.split)
    corpus = split_assign(docs, weights, "doc_id", seed=args.seed)
    # null-keyed rows get a NULL split (no content key to decide by):
    # refuse them here rather than silently writing an unsplit doc
    corpus = corpus.where(F.col("split").isNotNull())
    corpus.write.mode("overwrite").partitionBy("split").parquet(
        args.out_dir + "/corpus"
    )

    kept = spark.read.parquet(args.out_dir + "/corpus")
    split_counts = {
        r.split: r.n
        for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    summary: dict = {
        "n_input": n_in,
        "n_kept": sum(split_counts.values()),
        "splits": split_counts,
        "sec": None,
    }

    if not args.no_decontam and "train" in weights and "test" in weights:
        rep = cross_split_contamination(kept, n=args.decontam_ngram)
        rep.write.mode("overwrite").parquet(args.out_dir + "/decontam")
        rep = spark.read.parquet(args.out_dir + "/decontam")
        stats = rep.agg(
            F.count("*").alias("n_test_docs"),
            F.sum((F.col("contamination") > 0.5).cast("int")).alias(
                "n_contaminated_gt50"
            ),
            F.max("contamination").alias("max_contamination"),
        ).collect()[0]
        summary["decontam"] = {
            "n_test_docs": stats.n_test_docs,
            "n_contaminated_gt50": int(stats.n_contaminated_gt50 or 0),
            "max_contamination": round(stats.max_contamination or 0.0, 6),
        }

    summary["sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    return 0


def main() -> None:
    raise SystemExit(run())


if __name__ == "__main__":
    main()
