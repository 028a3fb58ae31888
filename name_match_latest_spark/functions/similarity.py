"""String similarity metrics (pure Python, no Spark).

Pins the exact definitions the reference uses (strsim 0.11.1):

* ``levenshtein``        — char-level edit distance (strsim ``levenshtein``)
* ``sim_levenshtein_pct``— reference ``helpers.rs:26-33``: distance counts
  **Unicode chars** but max-length counts **BYTES** (UTF-8).  For non-ASCII
  input after ``normalize_simple`` (which keeps diacritics) these diverge;
  we replicate the quirk exactly.
* ``jaro`` / ``jaro_winkler`` — strsim 0.11 semantics (rewritten upstream to
  match rapidfuzz): common prefix capped at 4, winkler boost applied only
  when the Jaro similarity exceeds 0.7, p = 0.1.

The Spark engine evaluates ``levenshtein``/``sim_levenshtein_pct`` JVM-side
(``F.levenshtein`` is codepoint-based + ``octet_length`` for bytes);
``tests/test_similarity.py`` asserts the Column variant agrees with these.
Jaro-Winkler has no Spark builtin and runs inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

__all__ = ["levenshtein", "sim_levenshtein_pct", "jaro", "jaro_winkler"]


def levenshtein(a: str, b: str) -> int:
    """Char-level Levenshtein distance (classic Wagner-Fischer, 2 rows)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la > lb:  # keep the inner row short
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cb = b[j - 1]
        cur0 = j
        curr = [cur0]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == cb else 1
            v = min(prev[i] + 1, cur0 + 1, prev[i - 1] + cost)
            curr.append(v)
            cur0 = v
        prev = curr
    return prev[la]


def sim_levenshtein_pct(a: str, b: str) -> float:
    """``(1 - lev_chars(a,b) / max(len_bytes(a), len_bytes(b))) * 100``.

    100.0 when both byte-empty.  Mirrors ``helpers.rs:26-33`` where
    ``a.len()`` is the Rust BYTE length while ``strsim::levenshtein``
    counts chars.
    """
    max_len = max(len(a.encode("utf-8")), len(b.encode("utf-8")))
    if max_len == 0:
        return 100.0
    return (1.0 - levenshtein(a, b) / max_len) * 100.0


def jaro(a: str, b: str) -> float:
    """Jaro similarity over Unicode chars (strsim-compatible).

    Match window = max(len)//2 - 1 (floored at 0); transpositions counted
    over matched sequences in order.
    """
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    search_range = max(la, lb) // 2 - 1
    if search_range < 0:
        search_range = 0
    b_flags = [False] * lb
    a_matches: list[str] = []
    for i, ca in enumerate(a):
        lo = i - search_range if i > search_range else 0
        hi = i + search_range + 1
        if hi > lb:
            hi = lb
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                b_flags[j] = True
                a_matches.append(ca)
                break
    m = len(a_matches)
    if m == 0:
        return 0.0
    transpositions = 0
    k = 0
    for j in range(lb):
        if b_flags[j]:
            if b[j] != a_matches[k]:
                transpositions += 1
            k += 1
    t = transpositions // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str) -> float:
    """strsim 0.11.1 ``jaro_winkler``: prefix capped at 4, boost only
    when jaro > 0.7, scaling factor 0.1."""
    sim = jaro(a, b)
    if sim > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca == cb:
                prefix += 1
            else:
                break
        sim += 0.1 * prefix * (1.0 - sim)
    return sim
