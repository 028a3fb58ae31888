"""Round-5 observability queries: per-level cascade summary and the
block-size-guard histogram (cascade.rs:888-903 per-level counts;
advanced_matcher.rs:193-216 skip guard).  DuckDB hash-parity is
covered by the driver oracle gate; these tests pin the internal
consistency the oracle can't see (summary vs the pair query it
summarizes, guard monotonicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cascade_summary_consistent_with_exclusive_run(spark):
    from name_match_latest_spark.driver_queries import SPARK_QUERIES

    pairs = SPARK_QUERIES["cascade_run_exclusive"](spark, SF)
    summary = SPARK_QUERIES["cascade_summary"](spark, SF).collect()

    per_level = {
        r.level: r["count"]
        for r in pairs.groupBy("level").count().collect()
    }
    assert summary, "summary must be non-empty at sf0.001"
    assert {r.level for r in summary} == set(per_level)
    for r in summary:
        assert r.n_matches == per_level[r.level]
        # distinct ids can never exceed the pair count
        assert 0 < r.n_t1 <= r.n_matches
        assert 0 < r.n_t2 <= r.n_matches


def test_block_guard_stats_caps_every_block(spark):
    from name_match_latest_spark.driver_queries import (
        SPARK_QUERIES,
        load_persons,
    )
    from name_match_latest_spark.operators.blocking import (
        algo3_block_key,
        block_histogram,
    )

    hist = SPARK_QUERIES["block_guard_stats"](spark, SF)
    agg = hist.agg(
        F.max("n_rows").alias("mx"), F.count("*").alias("n_blocks")
    ).collect()[0]
    assert agg.mx <= 3, "guard must drop every block larger than the cap"
    assert agg.n_blocks > 0

    # the guard only ever REMOVES whole blocks: unguarded histogram,
    # restricted to surviving keys, must agree row-for-row
    t1, _ = load_persons(spark, SF)
    t1 = t1.filter(
        F.col("first_name").isNotNull()
        & F.col("last_name").isNotNull()
        & F.col("birthdate").isNotNull()
    )
    unguarded = block_histogram(t1, algo3_block_key()).withColumnRenamed(
        "count", "n_all"
    )
    joined = hist.join(unguarded, "block_key", "inner")
    assert joined.filter(F.col("n_rows") != F.col("n_all")).count() == 0
    assert joined.count() == hist.count()
