"""Smoke-checks for bench.py's harness pieces at sf0.001 — a broken
bench entry otherwise surfaces only in the per-round driver run
(round 3: an ANSI union coerced the dup-crowd's string ids to BIGINT
and killed the whole suite's JSON)."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _bench_headline():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_names_are_registered_queries():
    import ast

    src = open(
        os.path.join(os.path.dirname(__file__), "..", "bench.py")
    ).read()
    tree = ast.parse(src)
    names: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "headline" for t in node.targets
        ):
            names = [ast.literal_eval(e) for e in node.value.elts]
    assert names, "headline list not found in bench.py"

    from name_match_latest_spark.driver_queries import SPARK_QUERIES

    missing = [n for n in names if n not in SPARK_QUERIES]
    assert not missing, missing


def test_dupheavy_corpus_construction_is_type_sane(spark):
    """The duplicate-heavy corpus (string replica ids unioned onto the
    parquet docs) must build and dedupe without ANSI cast failures."""
    from name_match_latest_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "lang"
    )
    crowd = (
        docs.orderBy("doc_id")
        .limit(5)
        .crossJoin(spark.range(20).select(F.col("id").alias("_rep")))
        .select(
            F.concat_ws("_", "doc_id", "_rep").alias("doc_id"), "text", "lang"
        )
    )
    dup = docs.unionByName(crowd)
    assert dict(dup.dtypes)["doc_id"] == "string"
    # bounded candidates under a small cap; must not raise
    n = minhash_lsh_candidates(dup, max_bucket=10).count()
    assert n >= 0
