"""Property-based tests (hypothesis) over the pure parity layer —
invariants that hold for ALL inputs, complementing the fixed vectors."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from name_match_latest_spark.functions.normalize import (
    normalize_for_phonetic,
    normalize_simple,
    normalize_text,
)
from name_match_latest_spark.functions.phonetics import double_metaphone, soundex4_ascii
from name_match_latest_spark.functions.scoring import classify_full, classify_no_mid
from name_match_latest_spark.functions.similarity import (
    jaro,
    jaro_winkler,
    levenshtein,
    sim_levenshtein_pct,
)

text = st.text(max_size=40)
name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu"), max_codepoint=0x2FF),
    max_size=20,
)


class TestNormalizeProperties:
    @given(text)
    @settings(max_examples=300)
    def test_normalize_simple_second_pass_only_trims(self, s):
        # NOT idempotent — faithful reference quirk (helpers.rs:8-23):
        # trim runs BEFORE '-'->' ', so edge dashes leave edge spaces
        # ("-" -> " "); a second pass exactly strips them.
        once = normalize_simple(s)
        assert normalize_simple(once) == once.strip()

    @given(text)
    @settings(max_examples=300)
    def test_normalize_simple_no_dots(self, s):
        assert "." not in normalize_simple(s)
        assert "-" not in normalize_simple(s)

    @given(text)
    @settings(max_examples=300)
    def test_normalize_text_trimmed_lower(self, s):
        out = normalize_text(s)
        assert out == out.strip()

    @given(text)
    @settings(max_examples=300)
    def test_phonetic_charset(self, s):
        out = normalize_for_phonetic(s)
        assert re.fullmatch(r"[a-z ]*", out)
        assert "  " not in out
        assert not out.endswith(" ")


class TestPhoneticProperties:
    @given(text)
    @settings(max_examples=300)
    def test_soundex_shape(self, s):
        out = soundex4_ascii(s)
        assert len(out) == 4
        assert re.fullmatch(r"[A-Z][0-6]{3}|0000", out)

    @given(name)
    @settings(max_examples=200)
    def test_dmeta_deterministic_and_bounded(self, s):
        a = double_metaphone(s)
        assert a == double_metaphone(s)
        assert len(a) <= 4
        assert re.fullmatch(r"[A-Z0 ]*", a)


class TestSimilarityProperties:
    @given(name, name)
    @settings(max_examples=300)
    def test_levenshtein_metric(self, a, b):
        assert levenshtein(a, b) == levenshtein(b, a)
        assert levenshtein(a, b) <= max(len(a), len(b))
        assert (levenshtein(a, b) == 0) == (a == b)

    @given(name, name)
    @settings(max_examples=300)
    def test_jw_bounds(self, a, b):
        j = jaro(a, b)
        jw = jaro_winkler(a, b)
        assert 0.0 <= j <= 1.0
        assert j <= jw <= 1.0

    @given(name, name)
    @settings(max_examples=300)
    def test_sim_lev_pct_bounds(self, a, b):
        v = sim_levenshtein_pct(a, b)
        # chars <= bytes, so pct >= 0 always; == 100 iff equal or both empty
        assert 0.0 <= v <= 100.0
        if a == b:
            assert v == 100.0


class TestCascadeProperties:
    @given(name, name, name, name)
    @settings(max_examples=200)
    def test_symmetric_decision_no_mid(self, f1, l1, f2, l2):
        # scores are symmetric (all three metrics are)
        r1 = classify_no_mid(f1, l1, f2, l2)
        r2 = classify_no_mid(f2, l2, f1, l1)
        assert (r1 is None) == (r2 is None)
        if r1 is not None:
            assert abs(r1[0] - r2[0]) < 1e-9

    @given(name, name, name)
    @settings(max_examples=200)
    def test_self_match_is_direct(self, f, m, l):
        r = classify_full(f, m, l, f, m, l)
        full_empty = not f"{f} {m} {l}".strip() or not normalize_simple(
            f"{f} {m} {l}"
        ).strip()
        if full_empty:
            assert r is None
        else:
            assert r == (100.0, "DIRECT MATCH")
