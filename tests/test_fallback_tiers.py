"""Algo 3 fallback-tier semantics with adversarial names.

The generated fixtures rarely (if ever) leave a primary block empty —
these cases force each tier explicitly and compare engine vs oracle:

  tier 2: probe (year, '?', li, sx) — only t2 rows whose OWN first
          initial is '?' (no ASCII letters) live in such blocks
  tier 3: probe (year, fi, li, sx[:2]+'00')
  and the "fallback only when the primary block is EMPTY" rule.
"""

from __future__ import annotations

from datetime import date

from name_match_latest_spark.oracle import Person, oracle_fuzzy
from tests.conftest import persons_df


def _engine_pairs(spark, t1, t2):
    from name_match_latest_spark.operators.algos import match_fuzzy

    d1, d2 = persons_df(spark, t1), persons_df(spark, t2)
    return {
        (r.t1_id, r.t2_id): (round(r.confidence, 9), r.case_label)
        for r in match_fuzzy(d1, d2).select(
            "t1_id", "t2_id", "confidence", "case_label"
        ).collect()
    }


def _oracle_pairs(t1, t2):
    return {(a, b): (round(c, 9), l) for a, b, c, l in oracle_fuzzy(t1, t2)}


def test_tier2_question_mark_initial(spark):
    bd = date(1990, 1, 1)
    # t1 probe: first name has NO ascii letters after normalize_text
    # ("Łł" -> "łł", every byte non-ascii-alpha) -> fi='?'
    t1 = [Person(id=1, first_name="Łł", last_name="Santos", birthdate=bd)]
    # t2 row with the same property lands in the (year,'?',li,sx) block
    t2 = [
        Person(id=10, first_name="Øø", last_name="Santos", birthdate=bd),
        Person(id=11, first_name="Maria", last_name="Santos", birthdate=bd),
    ]
    engine = _engine_pairs(spark, t1, t2)
    oracle = _oracle_pairs(t1, t2)
    assert engine == oracle


def test_tier2_only_when_primary_empty(spark):
    bd = date(1985, 6, 15)
    # probe with fi='?' whose '?' block EXISTS in t2 (primary hit):
    t1 = [Person(id=1, first_name="Łukasz?", last_name="Reyes", birthdate=bd)]
    # wait: "Łukasz?" has ascii letters -> fi='U'... use pure-symbol name
    t1 = [Person(id=1, first_name="Łł", last_name="Reyes", birthdate=bd)]
    t2 = [
        Person(id=20, first_name="Øø", last_name="Reyes", birthdate=bd),  # '?' block
        Person(id=21, first_name="Lukasz", last_name="Reyes", birthdate=bd),
    ]
    assert _engine_pairs(spark, t1, t2) == _oracle_pairs(t1, t2)


def test_tier3_soundex_truncation(spark):
    bd = date(1970, 3, 3)
    # t1 last name soundexes to e.g. S532; t2 has no (year,fi,li,S532)
    # and no '?' block, but HAS a block whose sx == S5'00'
    t1 = [Person(id=1, first_name="Ana", last_name="Sandt", birthdate=bd)]
    # soundex4("sandt") = S530; truncated probe = S5 + '00' = S500
    t2 = [Person(id=30, first_name="Ana", last_name="Sun", birthdate=bd)]
    from name_match_latest_spark.functions.phonetics import soundex4_ascii

    assert soundex4_ascii("sun") == "S500"
    assert _engine_pairs(spark, t1, t2) == _oracle_pairs(t1, t2)


def test_fallbacks_not_taken_when_primary_nonempty(spark):
    bd = date(1970, 3, 3)
    # primary block exists but yields NO match after scoring; the
    # reference does NOT fall back in that case (set non-empty)
    t1 = [Person(id=1, first_name="Ana", last_name="Sandt", birthdate=bd)]
    t2 = [
        # same block key (year, A, S, S530): soundex("sandt")==soundex("smdt")?
        Person(id=40, first_name="Axxxxxx", last_name="Sandt", birthdate=bd),
        # would-be tier-3 match that must NOT be reached
        Person(id=41, first_name="Ana", last_name="Sun", birthdate=bd),
    ]
    engine = _engine_pairs(spark, t1, t2)
    oracle = _oracle_pairs(t1, t2)
    assert engine == oracle
    assert (1, 41) not in engine  # fallback suppressed by non-empty primary


def test_mixed_scale_fallbacks_vs_oracle(spark):
    """A soup of fallback-triggering and normal rows, both swap modes."""
    from name_match_latest_spark.operators.algos import match_fuzzy

    bd1, bd2 = date(1990, 4, 12), date(1990, 12, 4)
    t1, t2 = [], []
    pid = 1
    for i, (fn, ln) in enumerate(
        [("Łł", "Santos"), ("Ana", "Sandt"), ("Maria", "Cruz"), ("Øø", "Reyes"),
         ("Jose", "Sun"), ("Ana", "Santos")]
    ):
        t1.append(Person(id=pid, first_name=fn, last_name=ln,
                         birthdate=bd1 if i % 2 else bd2))
        pid += 1
    for i, (fn, ln) in enumerate(
        [("Øø", "Santos"), ("Ana", "Sun"), ("Mariah", "Cruz"), ("Łł", "Reyes"),
         ("Jose", "Sandt"), ("Anah", "Santos")]
    ):
        t2.append(Person(id=100 + i, first_name=fn, last_name=ln,
                         birthdate=bd1 if i % 3 else bd2))
    for swap in (False, True):
        d1, d2 = persons_df(spark, t1), persons_df(spark, t2)
        engine = {
            (r.t1_id, r.t2_id): (round(r.confidence, 9), r.case_label)
            for r in match_fuzzy(d1, d2, allow_swap=swap).select(
                "t1_id", "t2_id", "confidence", "case_label"
            ).collect()
        }
        oracle = {(a, b): (round(c, 9), l) for a, b, c, l in
                  oracle_fuzzy(t1, t2, allow_swap=swap)}
        assert engine == oracle, f"swap={swap}"
