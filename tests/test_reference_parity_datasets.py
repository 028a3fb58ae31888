"""The reference's curated benchmark datasets + published parity gates.

Reference: `src/benchmarking/mod.rs:788-911` defines five deterministic
fixtures (small/medium/large/duplicate-heavy/messy) run through
`MatchingAlgorithm::Fuzzy` with `allow_birthdate_swap: false`
(mod.rs:483-507), and `docs/adaptive-ultra-benchmark-json/parity-*.json`
publishes the expected match counts:

    small 24x28 -> 21      medium 500x560 -> 164
    large 2000x2200 -> 1735   duplicate-heavy 800x900 -> 600
    messy 6x6 -> 4

This test regenerates the SAME fixtures (re-derived generator, not
copied code) and gates our `match_fuzzy` on the exact published
counts, plus pair-id-set equality against the reference-faithful
Python oracle (`oracle.oracle_fuzzy`).
"""

from __future__ import annotations

import datetime

import pytest

from name_match_latest_spark.oracle import Person, oracle_fuzzy

FIRST = [
    "Ana", "Maria", "Jose", "Juan", "Rosa", "Luis", "Elena", "Pedro",
    "Mila", "Nora", "Carlo", "Sofia",
]
LAST = [
    "Santos", "Reyes", "Cruz", "Garcia", "Dela Cruz", "Ramos", "Mendoza",
    "Torres", "Bautista", "Navarro", "Aquino", "Castillo",
]


def _person(pid, first, middle, last, year, month, day):
    return Person(
        id=pid,
        uuid=f"uuid-{pid}",
        first_name=first,
        middle_name=middle,
        last_name=last,
        birthdate=datetime.date(year, month, day),
        hh_id=str(pid // 10),
        barangay_code=None,
        city_code=None,
    )


def generated_dataset(left_count, right_count, skew, duplicates):
    """mod.rs:806-861 (re-derived)."""
    left, right = [], []
    for i in range(left_count):
        base = i % len(FIRST)
        left.append(
            _person(
                i + 1,
                FIRST[base],
                "Mae" if i % 3 == 0 else "Luis",
                LAST[(i // 2) % len(LAST)],
                1980 + i % 32,
                1 + i % 12,
                1 + i % 27,
            )
        )
    for j in range(right_count):
        s = j // 2 if duplicates else j
        base = (s + skew) % len(FIRST)
        first = FIRST[base] + ("h" if j % 17 == 0 else "")
        right.append(
            _person(
                j + 10_001,
                first,
                "Mae" if j % 3 == 0 else "Luis",
                LAST[((s + skew) // 2) % len(LAST)],
                1980 + (s + skew) % 32,
                1 + (s + skew) % 12,
                1 + (s + skew) % 27,
            )
        )
    return left, right


def generated_messy_dataset():
    """mod.rs:880-899 (re-derived; note 'Ana  ' trailing spaces,
    Some("") middle, and the empty right-side first name)."""
    left = [
        _person(1, "Maria", "Cristina", "Santos", 1990, 1, 2),
        _person(2, "Kristina", None, "De la Cruz", 1988, 5, 9),
        _person(3, "Jose", "L", "Reyes", 1975, 7, 14),
        _person(4, "Ana  ", "Mae", "Garcia", 1992, 3, 4),
        _person(5, "Sofia", "Isabel", "Nunez", 1981, 11, 20),
        _person(6, "Carlo", "", "Ocampo", 1999, 9, 17),
    ]
    right = [
        _person(101, "Cristina", "Maria", "Santos", 1990, 1, 2),
        _person(102, "Kristine", None, "Dela Cruz", 1988, 5, 9),
        _person(103, "Joseph", "L", "Reyes", 1975, 7, 14),
        _person(104, "Ana", "Mae", "Garcia", 1992, 3, 4),
        _person(105, "Sofia", "Isabel", "Nunez", 1981, 11, 20),
        _person(106, "", None, "Ocampo", 1999, 9, 17),
    ]
    return left, right


def generated_sparse_dataset():
    """mod.rs:863-872 (re-derived): right side mostly rewritten to
    non-matching birthdates + synthetic last names.  No published
    count — gated on oracle pair-set equality only."""
    left, right = generated_dataset(400, 420, 19, False)
    for idx, p in enumerate(right):
        if idx % 3 != 0:
            p.birthdate = datetime.date(1960 + idx % 30, 12, 28)
            p.last_name = f"SparseLast{idx}"
    return left, right


DATASETS = {
    "small": (lambda: generated_dataset(24, 28, 3, False), 21),
    "medium": (lambda: generated_dataset(500, 560, 7, False), 164),
    "duplicate-heavy": (lambda: generated_dataset(800, 900, 5, True), 600),
    "messy": (generated_messy_dataset, 4),
    "sparse": (generated_sparse_dataset, None),
    "large": (lambda: generated_dataset(2_000, 2_200, 11, False), 1_735),
}


def _spark_pairs(spark, left, right):
    from name_match_latest_spark.operators.algos import match_fuzzy
    from name_match_latest_spark.plans.caching import unpersist_tracked
    from tests.conftest import persons_df

    t1, t2 = persons_df(spark, left), persons_df(spark, right)
    out = {
        (r.t1_id, r.t2_id)
        for r in match_fuzzy(t1, t2, allow_swap=False)
        .select("t1_id", "t2_id")
        .collect()
    }
    unpersist_tracked()
    return out


@pytest.mark.parametrize("name", list(DATASETS))
def test_published_parity_gate(spark, name):
    build, expected = DATASETS[name]
    left, right = build()
    got = _spark_pairs(spark, left, right)
    if expected is not None:
        assert len(got) == expected, f"{name}: {len(got)} != published {expected}"
    # pair-id sets must also agree with the reference-faithful oracle
    want = {(t[0], t[1]) for t in oracle_fuzzy(left, right, allow_swap=False)}
    assert got == want
