"""Gap-based sessionization: semantics on a hand-computed log, and
the one-exchange plan contract (operators/events.py — window key ==
exchange key, rollup key ⊇ exchange key)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def _log(spark):
    rows = [
        # user 1: two sessions split by a 31-min gap
        (0, _ts(0), 1, "a", 1.0),
        (1, _ts(10), 1, "b", 2.0),
        (2, _ts(41, 0, 1), 1, "c", 4.0),  # 31min1µs after prev -> new
        # user 2: gap of EXACTLY 30min stays in-session (strict >)
        (3, _ts(0), 2, "a", 1.0),
        (4, _ts(30), 2, "b", 1.0),
        # user 3: timestamp tie broken by event_id, same session
        (5, _ts(5), 3, "a", 1.0),
        (6, _ts(5), 3, "b", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_sessionize_hand_computed(spark):
    from name_match_latest_spark.operators.events import sessionize

    got = {
        (r.event_id): (r.user_id, r.session_seq)
        for r in sessionize(_log(spark)).collect()
    }
    assert got == {
        0: (1, 1),
        1: (1, 1),
        2: (1, 2),
        3: (2, 1),
        4: (2, 1),  # exactly-30min gap does NOT split
        5: (3, 1),
        6: (3, 1),
    }


def test_session_stats_rollup(spark):
    from name_match_latest_spark.operators.events import session_stats

    rows = {
        (r.user_id, r.session_seq): r
        for r in session_stats(_log(spark)).collect()
    }
    assert len(rows) == 4
    s11 = rows[(1, 1)]
    assert s11.n_events == 2 and s11.sum_value == 3.0
    assert s11.session_start == _ts(0)
    assert s11.session_end == _ts(10)
    s12 = rows[(1, 2)]
    assert s12.n_events == 1 and s12.session_start == _ts(41, 0, 1)


def test_session_sum_partitioning_invariant(spark):
    """sum_value must be bit-identical under any input partitioning
    and equal the serial in-order fold (the order a single-threaded
    window+aggregate engine sums in).  2-decimal values put every
    session total within ulps of the floor(x*1e6) grid, so a parallel
    float SUM here is a coin flip per session — the round-5 driver
    hash miss."""
    import math

    from name_match_latest_spark.operators.events import session_stats

    vals = [round(0.01 + 0.07 * i % 9.43, 2) for i in range(240)]
    rows = [
        (i, _ts(i // 60, i % 60), 1 + i % 3, "e", vals[i])
        for i in range(240)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double",
    )

    def collect(d):
        return {
            (r.user_id, r.session_seq): r.sum_value
            for r in session_stats(d).collect()
        }

    a = collect(df.repartition(1))
    b = collect(df.repartition(17, "event_id"))
    c = collect(df.repartition(5, "value"))
    assert a == b == c  # exact float equality, no rounding

    # serial-fold truth in (ts, event_id) order
    truth = {}
    for eid, ts, uid, _, v in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        truth.setdefault(uid, []).append(v)
    for uid, vs in truth.items():
        acc = 0.0
        for v in vs:
            acc += v
        assert a[(uid, 1)] == math.floor(acc * 1e6) / 1e6


def test_single_exchange_plan(spark):
    """The rollup groups on (user_id, session_seq) ⊇ the window's
    hash-partitioning on user_id — Catalyst must NOT insert a second
    exchange between the Window and the final HashAggregate."""
    from name_match_latest_spark.operators.events import session_stats

    plan = session_stats(_log(spark))._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(0, 1, 10.0), (1, 1, 25.0), (2, 2, 5.0), (3, 3, 7.0)],
        "event_id long, k long, t double",
    )
    right = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (9, 1.0, "c")],
        "k long, rt double, v string",
    )
    return left, right


def test_asof_join_left_semantics(spark):
    from name_match_latest_spark.operators.events import asof_join

    left, right = _asof_frames(spark)
    got = {
        r.event_id: (r.rt, r.v)
        for r in asof_join(left, right, on="k", left_ts="t", right_ts="rt").collect()
    }
    assert got == {
        0: (10.0, "a"),   # inclusive: rt == t matches
        1: (20.0, "b"),   # latest at-or-before, not first
        2: (None, None),  # key exists nowhere on the right
        3: (None, None),  # key 3 has no right rows
    }


def test_asof_join_ignores_null_right_ts(spark):
    """A NULL right timestamp can never satisfy <= (three-valued
    logic; DuckDB ASOF agrees) — its payload must not leak onto left
    rows via NULLS FIRST ordering."""
    from name_match_latest_spark.operators.events import asof_join

    left = spark.createDataFrame([(0, 1, 10.0)], "event_id long, k long, t double")
    right = spark.createDataFrame(
        [(1, None, "nullts"), (1, 50.0, "later")],
        "k long, rt double, v string",
    )
    rows = asof_join(left, right, on="k", left_ts="t", right_ts="rt").collect()
    assert len(rows) == 1 and rows[0].rt is None and rows[0].v is None
    assert (
        asof_join(
            left, right, on="k", left_ts="t", right_ts="rt", how="inner"
        ).count()
        == 0
    )


def test_asof_join_inner_drops_unmatched(spark):
    from name_match_latest_spark.operators.events import asof_join

    left, right = _asof_frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt", how="inner"
    )
    assert sorted(r.event_id for r in out.collect()) == [0, 1]


def test_asof_join_single_exchange(spark):
    from name_match_latest_spark.operators.events import asof_join

    left, right = _asof_frames(spark)
    plan = (
        asof_join(left, right, on="k", left_ts="t", right_ts="rt")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
