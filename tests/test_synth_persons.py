"""Distributed person generator (sources/synth.py): deterministic at
any parallelism, PERSON_SCHEMA-compatible, realistic variant mix —
the input fabric for the 5M x 5M scaling benchmark."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_parallelism_invariant(spark):
    from name_match_latest_spark.sources.synth import generate_persons_distributed

    a1 = generate_persons_distributed(spark, 3000, "a", partitions=2)
    a2 = generate_persons_distributed(spark, 3000, "a", partitions=7)
    assert a1.exceptAll(a2).count() == 0
    assert a2.exceptAll(a1).count() == 0


def test_schema_and_prepare(spark):
    from name_match_latest_spark.operators.persons import PERSON_SCHEMA, prepare_persons
    from name_match_latest_spark.sources.synth import generate_persons_distributed

    a = generate_persons_distributed(spark, 500, "a")
    assert [f.name for f in a.schema.fields] == [f.name for f in PERSON_SCHEMA.fields]
    prepared = prepare_persons(a)
    row = prepared.filter("id = 7").collect()[0]
    assert row.sx_last_n != "0000" and row.bd_str.startswith(("19", "20"))


def test_variant_mix_and_ground_truth(spark):
    """Side B redraws the same entities with ~30% edit-1 noise per
    varied field, at most one field varied per row; a blocked fuzzy
    match recovers the bulk of the pairs (reference-blocked regime:
    both sides here could be 5M rows)."""
    from name_match_latest_spark.operators.algos import match_fuzzy
    from name_match_latest_spark.operators.persons import prepare_persons
    from name_match_latest_spark.sources.synth import generate_persons_distributed

    n = 3000
    a = generate_persons_distributed(spark, n, "a")
    b = generate_persons_distributed(spark, n, "b")
    j = a.alias("x").join(
        b.alias("y"), F.col("x.id") + 1_000_000_000 == F.col("y.id")
    )
    both_same = j.filter(
        "x.first_name = y.first_name AND x.last_name = y.last_name"
    ).count()
    assert 0.40 * n < both_same < 0.60 * n  # ~0.7 * 0.7
    both_diff = j.filter(
        "x.first_name <> y.first_name AND x.last_name <> y.last_name"
    ).count()
    assert both_diff == 0  # at most one field varies

    m = match_fuzzy(prepare_persons(a), prepare_persons(b))
    truths = m.filter(F.col("t2_id") - 1_000_000_000 == F.col("t1_id")).count()
    assert truths > 0.8 * n  # cascade recovers most varied pairs
