"""Parity tests for the pure-Python scalar functions.

Vectors ported from the reference's in-file unit tests (cited per
case) plus the mandatory edge cases from FIXTURES.md.
"""

from datetime import date

import pytest

from name_match_latest_spark.functions import (
    classify_full,
    classify_no_mid,
    dmeta_code_from_simple,
    double_metaphone,
    is_full_middle,
    jaro_winkler,
    levenshtein,
    middle_initials,
    normalize_for_phonetic,
    normalize_simple,
    normalize_text,
    sim_levenshtein_pct,
    simple_full_name,
    soundex4_ascii,
)
from name_match_latest_spark.operators.dates import (
    birthdate_keys,
    birthdate_matches_naive,
    parse_date_strict,
    swap_month_day,
)


class TestNormalizeText:
    # normalize.rs:36-41
    def test_diacritics(self):
        assert normalize_text("Álvaro") == "alvaro"
        assert normalize_text("ÉÉ") == "ee"
        assert normalize_text("  José  ") == "jose"

    # normalize.rs:44-58 — ł has no combining-mark decomposition, kept
    def test_lukasz(self):
        assert normalize_text("Éva") == "eva"
        assert normalize_text("Łukasz") == "łukasz"

    def test_none(self):
        assert normalize_text(None) is None


class TestNormalizeSimple:
    # helpers.rs:8-23; FIXTURES.md dots/dashes cases
    def test_dots_dashes(self):
        assert normalize_simple("Dr. John-Paul") == "dr john paul"
        assert normalize_simple("M.") == "m"
        assert normalize_simple("O'Brien") == "o'brien"

    def test_trim_keeps_internal(self):
        assert normalize_simple("  Ana  ") == "ana"
        assert normalize_simple("De la  Cruz") == "de la  cruz"

    def test_diacritics_kept(self):
        assert normalize_simple("José") == "josé"

    def test_full_name_double_space_quirk(self):
        # mod.rs:75-86: empty middle leaves a double space
        assert simple_full_name("John", None, "Smith") == "john  smith"
        assert simple_full_name("John", "Q", "Smith") == "john q smith"


class TestNormalizeForPhonetic:
    # helpers.rs:37-66
    def test_basic(self):
        assert normalize_for_phonetic("José") == "jose"
        assert normalize_for_phonetic("Müller") == "muller"
        assert normalize_for_phonetic("Straße") == "strasse"
        assert normalize_for_phonetic("Søren") == "soren"
        assert normalize_for_phonetic("Đorđe") == "dorde"

    def test_whitespace_collapse(self):
        assert normalize_for_phonetic("a   b") == "a b"
        assert normalize_for_phonetic("  x  ") == "x"

    def test_non_ascii_dropped(self):
        assert normalize_for_phonetic("王小明") == ""
        assert normalize_for_phonetic("JO∩N") == "jon"


class TestSimilarity:
    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0

    def test_sim_levenshtein_pct_char_byte_quirk(self):
        # helpers.rs:26-33: char distance / BYTE max-length
        assert sim_levenshtein_pct("josé", "jose") == pytest.approx(80.0)
        assert sim_levenshtein_pct("", "") == 100.0
        assert sim_levenshtein_pct("abc", "abd") == pytest.approx((1 - 1 / 3) * 100)

    def test_jaro_winkler_known_values(self):
        # strsim 0.11 semantics (prefix<=4, boost only when jaro > 0.7)
        assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
        assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333333332)
        assert jaro_winkler("", "") == 1.0
        assert jaro_winkler("a", "") == 0.0
        # long common prefix capped at 4
        assert jaro_winkler("prefixxx", "prefiyyy") <= 1.0

    def test_jw_no_boost_below_07(self):
        # identical first char but low jaro: boost must not apply
        a, b = "az", "aqqqqqqqqqqqq"
        from name_match_latest_spark.functions import jaro

        j = jaro(a, b)
        assert j <= 0.7
        assert jaro_winkler(a, b) == j


class TestSoundex4:
    # helpers.rs:97-132 — the NON-standard variant
    def test_basic(self):
        assert soundex4_ascii("robert") == "R163"
        assert soundex4_ascii("") == "0000"

    def test_first_letter_code_not_suppressed(self):
        # 'p' (code 1) then 'b' (code 1): standard soundex suppresses the
        # b; this variant records it because `last` starts at 0.
        assert soundex4_ascii("pb") == "P100"

    def test_vowel_resets_last(self):
        assert soundex4_ascii("bab") == "B100"
        # b-a-b-a-b: each 'a' resets last so every b IS coded
        assert soundex4_ascii("babab") == "B110"

    def test_hw_reset(self):
        # standard soundex treats h/w as transparent (still suppressing
        # dupes across them); this variant resets on ANY non-coded char
        assert soundex4_ascii("bhbhb") == "B110"

    def test_multibyte_bytes_skipped(self):
        assert soundex4_ascii("łukasz") == "U220"


class TestDoubleMetaphone:
    # commons-codec DoubleMetaphoneTest vectors (rphonetic is a port of
    # commons-codec; helpers.rs:70-92 uses the primary code)
    @pytest.mark.parametrize(
        "word,code",
        [
            ("maurice", "MRS"),
            ("alessandra", "ALSN"),
            ("aubrey", "APR"),
            ("cambrillo", "KMPR"),
            ("heidi", "HT"),
            ("katherine", "K0RN"),
            ("catherine", "K0RN"),
            ("richard", "RXRT"),
            ("bob", "PP"),
            ("eric", "ARK"),
            ("geoff", "JF"),
            ("dave", "TF"),
            ("ray", "R"),
            ("steven", "STFN"),
            ("bryce", "PRS"),
            ("randy", "RNT"),
            ("bryan", "PRN"),
            ("brian", "PRN"),
            ("otto", "AT"),
            ("auto", "AT"),
            ("jose", "HS"),
        ],
    )
    def test_primary(self, word, code):
        assert double_metaphone(word) == code

    @pytest.mark.parametrize(
        "word,primary,alternate",
        [
            ("smith", "SM0", "XMT"),
            ("schmidt", "XMT", "SMT"),
            ("johnson", "JNSN", "ANSN"),
        ],
    )
    def test_alternate(self, word, primary, alternate):
        assert double_metaphone(word) == primary
        assert double_metaphone(word, alternate=True) == alternate

    def test_dmeta_code_from_simple(self):
        # mod.rs:429-438: empty phonetic -> ""
        assert dmeta_code_from_simple("王小明") == ""
        assert dmeta_code_from_simple("john  smith") == double_metaphone("john smith")


class TestMiddleHelpers:
    # advanced_matcher.rs:52-61, 84-91
    def test_middle_initials(self):
        assert middle_initials("Maria Santos") == "ms"
        assert middle_initials("Jose") == "j"
        assert middle_initials("...") is None
        assert middle_initials(None) is None

    def test_is_full_middle(self):
        assert is_full_middle("Mae")
        assert not is_full_middle("M")
        assert not is_full_middle("M.")
        assert not is_full_middle(". .")
        assert is_full_middle("de la")
        assert not is_full_middle(None)


class TestBirthdates:
    # birthdate_matcher.rs:107-157
    def test_exact(self):
        assert birthdate_matches_naive(date(1990, 3, 15), date(1990, 3, 15), False)

    def test_swap(self):
        assert birthdate_matches_naive(date(1990, 4, 12), date(1990, 12, 4), True)
        assert not birthdate_matches_naive(date(1990, 4, 12), date(1990, 12, 4), False)

    def test_swap_invalid_rejected(self):
        assert swap_month_day(date(1990, 1, 31)) is None  # month 31 invalid

    def test_parse_strict(self):
        assert parse_date_strict("1990-03-15") == date(1990, 3, 15)
        assert parse_date_strict("1990/03/15") is None
        assert parse_date_strict(" 1990-03-15 ") == date(1990, 3, 15)
        assert parse_date_strict("90-03-15") is None

    def test_leap_year(self):
        assert birthdate_matches_naive(date(2020, 2, 29), date(2020, 2, 29), False)
        assert parse_date_strict("2021-02-29") is None

    def test_keys_include_swap(self):
        keys = birthdate_keys(date(1990, 4, 12), True)
        assert keys == ["1990-04-12", "1990-12-04"]
        # same-date swap deduped
        assert birthdate_keys(date(1990, 5, 5), True) == ["1990-05-05"]
        assert birthdate_keys(date(1990, 4, 12), False) == ["1990-04-12"]


class TestScoringCascade:
    def test_direct_match(self):
        assert classify_no_mid("John", "Smith", "john", "SMITH") == (100.0, "DIRECT MATCH")

    def test_fuzzy_basic_jon_john(self):
        # mod.rs:5595 fuzzy_basic: Jon/John Smith conf > 0.85
        res = classify_no_mid("Jon", "Smith", "John", "Smith")
        assert res is not None
        score, label = res
        assert score > 85.0

    def test_empty_no_match(self):
        # FIXTURES.md: empty first with matching last must not match is
        # enforced by cascade score, not emptiness (full name non-empty);
        # fully empty names -> None
        assert classify_no_mid("", "", "", "") is None
        assert classify_full(None, None, None, None, None, None) is None

    def test_spelling_variants(self):
        # FIXTURES.md: Kristina De la Cruz vs Kristine Dela Cruz
        res = classify_no_mid("Kristina", "De la Cruz", "Kristine", "Dela Cruz")
        assert res is not None

    def test_trailing_whitespace(self):
        # "Ana  " leaves extra INTERNAL spaces in the full name (the
        # reference never collapses them), so this is NOT a direct
        # match — it survives via metaphone (which collapses ws) + jw.
        assert classify_no_mid("Ana  ", "Cruz", "Ana", "Cruz") == (92.0, "CASE 3")
        # trailing ws on the combined string IS trimmed
        assert classify_no_mid("Ana", "Cruz  ", "Ana", "Cruz") == (100.0, "DIRECT MATCH")

    def test_unrelated_no_match(self):
        assert classify_no_mid("Alice", "Wong", "Roberto", "Fernandez") is None

    def test_case3_label(self):
        # high avg + per-field distance <= 2 -> CASE 3 when not CASE 1
        res = classify_full("Maria", "Cristina", "Santos", "Mariah", "Cristina", "Santos")
        assert res is not None
        assert res[1] in ("CASE 1", "CASE 2", "CASE 3")

    def test_middle_swap_changes_full(self):
        # swapped first/middle: full strings differ but may still pass
        r = classify_full("Maria Cristina", None, "Santos", "Cristina Maria", None, "Santos")
        # not asserting match/no-match — asserting determinism vs oracle twice
        assert r == classify_full("Maria Cristina", None, "Santos", "Cristina Maria", None, "Santos")
