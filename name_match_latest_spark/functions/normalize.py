"""Text normalization primitives (pure Python, no Spark).

Reproduces the reference's three normalization layers exactly
(semantics extracted from /root/reference — see docstrings):

* ``normalize_text``    — reference ``src/normalize.rs:3-17``
* ``normalize_simple``  — reference ``src/matching/helpers.rs:8-23``
* ``normalize_for_phonetic`` — reference ``src/matching/helpers.rs:37-66``

These are the single source of truth for parity tests; the Spark
engine uses Column-expression equivalents where possible (JVM-side,
whole-stage-codegen) and pandas UDFs wrapping these functions where
Unicode semantics require it.  ``tests/test_normalize.py`` asserts the
Column-expression variants agree with these on the fixture corpus.
"""

from __future__ import annotations

import unicodedata

__all__ = [
    "normalize_text",
    "normalize_simple",
    "normalize_for_phonetic",
    "simple_full_name",
    "simple_full_name_no_mid",
    "middle_initials",
    "is_full_middle",
]


def normalize_text(s: str | None) -> str | None:
    """NFD-decompose, strip combining marks, lowercase, trim.

    Mirrors ``normalize.rs:3-17``: ``nfd().filter(!is_combining_mark)
    .to_lowercase().trim()``.  Note the reference lowercases AFTER
    stripping marks and trims last.
    """
    if s is None:
        return None
    decomposed = unicodedata.normalize("NFD", s)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return stripped.lower().strip()


def normalize_simple(s: str | None) -> str:
    """Trim, drop ``.``, map ``-`` to space, lowercase everything else.

    Mirrors ``helpers.rs:8-23``.  Diacritics are KEPT.  Internal
    whitespace is NOT collapsed.  Lowercasing is per-char full Unicode
    case mapping (Rust ``char::to_lowercase`` == Python ``str.lower``
    for all practical name inputs).
    """
    if s is None:
        return ""
    out = []
    for ch in s.strip():
        if ch == ".":
            continue
        if ch == "-":
            out.append(" ")
        else:
            out.append(ch.lower())
    return "".join(out)


def simple_full_name(first: str | None, mid: str | None, last: str | None) -> str:
    """``normalize_simple(format!("{} {} {}", first, mid, last))``.

    Mirrors ``mod.rs:75-86`` / ``build_cpu_fuzzy_cache`` (``mod.rs:448``).
    An absent middle name leaves a DOUBLE space between first and last
    (the reference never collapses it) — parity-critical for
    Levenshtein/Jaro-Winkler scores.
    """
    return normalize_simple(f"{first or ''} {mid or ''} {last or ''}")


def simple_full_name_no_mid(first: str | None, last: str | None) -> str:
    """``normalize_simple(format!("{} {}", first, last))`` (``mod.rs:449``)."""
    return normalize_simple(f"{first or ''} {last or ''}")


def normalize_for_phonetic(s: str | None) -> str:
    """Prepare a string for Double Metaphone (``helpers.rs:37-66``).

    NFD-decompose; keep ASCII letters (lowercased); collapse ASCII
    whitespace runs to single spaces; map ss/ae/o/d for ß/æ|ǽ/ø/đ;
    drop everything else; trim trailing space.
    """
    if s is None:
        return ""
    out: list[str] = []
    for ch in unicodedata.normalize("NFD", s.strip()):
        for lc in ch.lower():
            if lc.isascii() and lc.isalpha():
                out.append(lc)
            elif lc.isascii() and lc in " \t\n\x0c\r":
                # Rust pushes unless out already ends with ' ' — a leading
                # space CAN be emitted when the first char was dropped.
                if not out or out[-1] != " ":
                    out.append(" ")
            elif lc == "ß":
                out.append("ss")
            elif lc in ("æ", "ǽ"):
                out.append("ae")
            elif lc == "ø":
                out.append("o")
            elif lc == "đ":
                out.append("d")
    return "".join(out).rstrip()


def middle_initials(s: str | None) -> str | None:
    """First ASCII-alpha char of each whitespace token, lowercased.

    Mirrors ``advanced_matcher.rs:52-61`` ("Maria Santos" -> "ms").
    Returns None when no initials found (or input None).
    """
    if s is None:
        return None
    out = []
    for part in s.split():
        for c in part:
            if c.isascii() and c.isalpha():
                out.append(c.lower())
                break
    return "".join(out) or None


def is_full_middle(s: str | None) -> bool:
    """Middle name counts as "full" iff >=2 non-dot non-space chars.

    Mirrors ``advanced_matcher.rs:84-91``: ``trim_matches('.')`` strips
    leading/trailing dots only, then counts non-whitespace chars.
    """
    if s is None:
        return False
    stripped = s.strip(".")
    return sum(1 for c in stripped if not c.isspace()) >= 2
