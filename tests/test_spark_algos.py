"""Spark engine vs single-node oracle: pair-for-pair equality.

The oracle re-implements the reference routines faithfully
(oracle.py); the Spark engine must reproduce the same (id1, id2)
pair sets, confidences (f64) and case labels on the seeded fixture
corpus — with and without birthdate swap.
"""

from __future__ import annotations

import pytest

from name_match_latest_spark.oracle import (
    generate_persons,
    oracle_algo1,
    oracle_algo2,
    oracle_fuzzy,
    oracle_fuzzy_no_mid,
    oracle_lev_weighted,
)
from tests.conftest import persons_df


@pytest.fixture(scope="module")
def fixture(spark):
    t1, t2 = generate_persons(60, seed=42)
    return t1, t2, persons_df(spark, t1), persons_df(spark, t2)


def _spark_pairs(df):
    return {(r.t1_id, r.t2_id) for r in df.select("t1_id", "t2_id").collect()}


def _spark_scored(df):
    return {
        (r.t1_id, r.t2_id): (r.confidence, r.case_label)
        for r in df.select("t1_id", "t2_id", "confidence", "case_label").collect()
    }


@pytest.mark.parametrize("allow_swap", [False, True])
def test_algo1(spark, fixture, allow_swap):
    from name_match_latest_spark.operators.algos import match_algo1

    t1, t2, d1, d2 = fixture
    got = _spark_pairs(match_algo1(d1, d2, allow_swap))
    want = set(oracle_algo1(t1, t2, allow_swap))
    assert got == want
    assert len(want) > 0


@pytest.mark.parametrize("allow_swap", [False, True])
def test_algo2(spark, fixture, allow_swap):
    from name_match_latest_spark.operators.algos import match_algo2

    t1, t2, d1, d2 = fixture
    got = _spark_pairs(match_algo2(d1, d2, allow_swap))
    want = set(oracle_algo2(t1, t2, allow_swap))
    assert got == want


@pytest.mark.parametrize("allow_swap", [False, True])
def test_fuzzy_algo3(spark, fixture, allow_swap):
    from name_match_latest_spark.operators.algos import match_fuzzy

    t1, t2, d1, d2 = fixture
    got = _spark_scored(match_fuzzy(d1, d2, allow_swap))
    want = {(a, b): (c, l) for a, b, c, l in oracle_fuzzy(t1, t2, allow_swap)}
    assert set(got) == set(want)
    for k, (conf, label) in want.items():
        assert got[k][1] == label, k
        assert got[k][0] == pytest.approx(conf, abs=1e-12), k
    assert len(want) > 0


@pytest.mark.parametrize("allow_swap", [False, True])
def test_fuzzy_algo4(spark, fixture, allow_swap):
    from name_match_latest_spark.operators.algos import match_fuzzy_no_mid

    t1, t2, d1, d2 = fixture
    got = _spark_scored(match_fuzzy_no_mid(d1, d2, allow_swap))
    want = {(a, b): (c, l) for a, b, c, l in oracle_fuzzy_no_mid(t1, t2, allow_swap)}
    assert set(got) == set(want)
    for k, (conf, label) in want.items():
        assert got[k][1] == label, k
        assert got[k][0] == pytest.approx(conf, abs=1e-12), k
    assert len(want) > 0


def test_algo7(spark, fixture):
    from name_match_latest_spark.operators.algos import match_lev_weighted

    t1, t2, d1, d2 = fixture
    rows = match_lev_weighted(d1, d2).select(
        "t1_id", "t2_id", "confidence", "matched_fields"
    ).collect()
    got = {(r.t1_id, r.t2_id): (r.confidence, tuple(r.matched_fields)) for r in rows}
    want = {(a, b): (c, f) for a, b, c, f in oracle_lev_weighted(t1, t2)}
    assert set(got) == set(want)
    for k, (conf, fields) in want.items():
        assert got[k][1] == fields, k
        assert got[k][0] == pytest.approx(conf, abs=1e-12), k
    assert len(want) > 0


def test_direct_norm_fuzzy_toggle(spark):
    """NAME_MATCHER_DIRECT_FUZZY_NORMALIZATION (mod.rs:2140-2177):
    with the toggle, keys are additionally normalize_simple'd so
    'J.ose'/'Jose' and 'Dela-Cruz'/'Dela Cruz' become key-equal."""
    from datetime import date

    from name_match_latest_spark.operators.algos import match_algo1
    from name_match_latest_spark.oracle import Person
    from tests.conftest import persons_df

    t1 = [Person(id=1, first_name="J.ose", last_name="Dela-Cruz", birthdate=date(1990, 1, 1))]
    t2 = [Person(id=2, first_name="Jose", last_name="Dela Cruz", birthdate=date(1990, 1, 1))]
    d1, d2 = persons_df(spark, t1), persons_df(spark, t2)
    assert match_algo1(d1, d2).count() == 0
    assert match_algo1(d1, d2, direct_norm_fuzzy=True).count() == 1
