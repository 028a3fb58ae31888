"""range_join (operators/events.py): bucketed point-in-interval join
— hand-computed pairs, bucket-boundary and inclusivity edges, the
oversized-interval fallback leg, and the no-BNLJ plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def _frames(spark):
    left = spark.createDataFrame(
        [(0, 1, 10.0), (1, 1, 100.0), (2, 1, 250.0), (3, 2, 10.0)],
        "pid long, k long, t double",
    )
    right = spark.createDataFrame(
        [
            (100, 1, 0.0, 10.0),     # closes ON point 0 (inclusive hi)
            (101, 1, 100.0, 150.0),  # opens ON point 1 (inclusive lo)
            (102, 1, 90.0, 260.0),   # spans several width-100 buckets
            (103, 2, 500.0, 600.0),  # never matches
        ],
        "iid long, k long, lo double, hi double",
    )
    return left, right


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.collect())


EXPECT = [(0, 100), (1, 101), (1, 102), (2, 102)]


def test_range_join_hand_computed(spark):
    from name_match_latest_spark.operators.events import range_join

    left, right = _frames(spark)
    out = range_join(left, right, "t", "lo", "hi", on="k", bucket_width=100)
    assert _pairs(out) == EXPECT


def test_range_join_oversized_interval_fallback(spark):
    """Forcing every multi-bucket interval through the fallback leg
    must not change the result set."""
    from name_match_latest_spark.operators.events import range_join

    left, right = _frames(spark)
    out = range_join(
        left, right, "t", "lo", "hi", on="k",
        bucket_width=100, max_buckets_per_interval=1,
    )
    assert _pairs(out) == EXPECT


def test_range_join_no_key_broadcast_leg(spark):
    from name_match_latest_spark.operators.events import range_join

    left = spark.createDataFrame([(0, 5.0), (1, 55.0)], "pid long, t double")
    right = spark.createDataFrame(
        [(100, 0.0, 10.0), (101, 0.0, 1e9)],  # second is oversized
        "iid long, lo double, hi double",
    )
    out = range_join(
        left, right, "t", "lo", "hi", bucket_width=10,
        max_buckets_per_interval=8,
    )
    assert _pairs(out) == [(0, 100), (0, 101), (1, 101)]


def test_range_join_keyed_plan_has_no_nested_loop(spark):
    from name_match_latest_spark.operators.events import range_join

    left, right = _frames(spark)
    plan = (
        range_join(left, right, "t", "lo", "hi", on="k", bucket_width=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_range_join_rejects_bad_width(spark):
    from name_match_latest_spark.operators.events import range_join

    left, right = _frames(spark)
    import pytest

    with pytest.raises(ValueError):
        range_join(left, right, "t", "lo", "hi", on="k", bucket_width=0)
