"""Pure-Python scalar functions: the parity layer.

Everything in this package is Spark-free and byte-exact with the
reference semantics (see module docstrings for file:line citations).
The distributed engine in ``..operators`` uses Column-expression
equivalents where possible and wraps these in Arrow-batched pandas
UDFs where Unicode/phonetic semantics require Python.
"""

from .normalize import (
    is_full_middle,
    middle_initials,
    normalize_for_phonetic,
    normalize_simple,
    normalize_text,
    simple_full_name,
    simple_full_name_no_mid,
)
from .phonetics import dmeta_code_from_simple, double_metaphone, soundex4_ascii
from .scoring import (
    PersonCache,
    classify_cached_full,
    classify_cached_no_mid,
    classify_full,
    classify_no_mid,
)
from .similarity import jaro, jaro_winkler, levenshtein, sim_levenshtein_pct

__all__ = [
    "normalize_text",
    "normalize_simple",
    "normalize_for_phonetic",
    "simple_full_name",
    "simple_full_name_no_mid",
    "middle_initials",
    "is_full_middle",
    "soundex4_ascii",
    "double_metaphone",
    "dmeta_code_from_simple",
    "levenshtein",
    "sim_levenshtein_pct",
    "jaro",
    "jaro_winkler",
    "PersonCache",
    "classify_full",
    "classify_no_mid",
    "classify_cached_full",
    "classify_cached_no_mid",
]
