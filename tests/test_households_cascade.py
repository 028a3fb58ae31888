"""Households Opt5/Opt6 and the exclusive cascade vs the oracle."""

from __future__ import annotations

import pytest

from name_match_latest_spark.oracle import (
    generate_persons,
    oracle_cascade,
    oracle_households,
)
from tests.conftest import persons_df


@pytest.fixture(scope="module")
def fixture(spark):
    t1, t2 = generate_persons(50, seed=11)
    return t1, t2, persons_df(spark, t1), persons_df(spark, t2)


@pytest.mark.parametrize("option", [5, 6])
def test_households_vs_oracle(spark, fixture, option):
    from name_match_latest_spark.operators.algos import match_fuzzy_no_mid
    from name_match_latest_spark.operators.households import household_aggregate

    t1, t2, d1, d2 = fixture
    pairs = match_fuzzy_no_mid(d1, d2, allow_swap=False)
    got = [
        (r.row_id, r.uuid, r.hh_id, round(r.match_percentage, 6))
        for r in household_aggregate(
            pairs, d1, d2, min_conf=0.8, option=option
        ).collect()
    ]
    want = [
        (rid, uuid, hh, round(pct, 6))
        for rid, uuid, hh, pct in oracle_households(t1, t2, 0.8, option=option)
    ]
    assert got == want
    assert len(want) > 0


@pytest.mark.parametrize("exclusive", [True, False])
def test_cascade_vs_oracle(spark, fixture, exclusive):
    from name_match_latest_spark.operators.cascade import CascadeConfig, run_cascade

    t1, t2, d1, d2 = fixture
    levels = [1, 2, 3, 5, 9, 10, 11]
    results = run_cascade(
        d1,
        d2,
        CascadeConfig(
            levels=levels, threshold=0.8, allow_birthdate_swap=True,
            exclusive=exclusive,
        ),
    )
    want = oracle_cascade(
        t1, t2, levels, threshold=0.8, allow_swap=True, exclusive=exclusive
    )
    total = 0
    for lr in results:
        got_pairs = sorted(
            (r.t1_id, r.t2_id) for r in lr.matches.select("t1_id", "t2_id").collect()
        )
        assert got_pairs == want[lr.level], f"level {lr.level}"
        total += len(got_pairs)
    assert total > 0
