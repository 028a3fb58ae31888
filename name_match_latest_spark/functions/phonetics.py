"""Phonetic encodings (pure Python, no Spark).

* ``soundex4_ascii`` — the reference's NON-standard 4-char Soundex
  (``helpers.rs:97-132``).  Differs from standard Soundex: the first
  letter's own code is never recorded as ``last`` and every non-coded
  char (vowels AND h/w) resets the duplicate suppressor.  Do NOT use
  ``F.soundex`` — Spark's builtin is standard Soundex and shifts
  blocking keys.  The Spark engine evaluates this as a pure Column
  expression (see ``operators/blocking.py``); tests assert equality.

* ``double_metaphone`` — Double Metaphone (Lawrence Philips), ported
  from the Apache Commons Codec implementation, which is also what the
  reference's ``rphonetic`` 3.0.4 crate ports (``helpers.rs:70-92``
  uses ``DoubleMetaphone::default().encode(..)`` = primary code,
  max length 4).  Inputs reaching this function have been through
  ``normalize_for_phonetic`` (lowercase ASCII letters + single
  spaces), but the port handles arbitrary ASCII.
"""

from __future__ import annotations

__all__ = ["soundex4_ascii", "double_metaphone", "dmeta_code_from_simple"]

_SOUNDEX_CODE = {
    "b": 1, "f": 1, "p": 1, "v": 1,
    "c": 2, "g": 2, "j": 2, "k": 2, "q": 2, "s": 2, "x": 2, "z": 2,
    "d": 3, "t": 3,
    "l": 4,
    "m": 5, "n": 5,
    "r": 6,
}


def soundex4_ascii(s: str) -> str:
    """Reference ``helpers.rs:97-132``.  Operates on the BYTES of the
    input, keeping only ASCII-alphabetic bytes (multi-byte UTF-8 chars
    contribute nothing).  Returns exactly 4 chars, '0'-padded."""
    out = ["0", "0", "0", "0"]
    if not s:
        return "".join(out)
    letters = [chr(b) for b in s.encode("utf-8") if (65 <= b <= 90) or (97 <= b <= 122)]
    if not letters:
        return "".join(out)
    out[0] = letters[0].upper()
    last = 0
    idx = 1
    for c in letters[1:]:
        if idx >= 4:
            break
        d = _SOUNDEX_CODE.get(c.lower(), 0)
        if d != 0 and d != last:
            out[idx] = str(d)
            idx += 1
        last = d
    return "".join(out)


# ---------------------------------------------------------------------------
# Double Metaphone (Apache Commons Codec port)
# ---------------------------------------------------------------------------

_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
)
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _Result:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int) -> None:
        self.primary: list[str] = []
        self.alternate: list[str] = []
        self.max_len = max_len

    def append(self, p: str, a: str | None = None) -> None:
        if a is None:
            a = p
        self.append_primary(p)
        self.append_alternate(a)

    def append_primary(self, s: str) -> None:
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s: str) -> None:
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def is_complete(self) -> bool:
        return len(self.primary) >= self.max_len and len(self.alternate) >= self.max_len


def _char_at(v: str, i: int) -> str:
    if i < 0 or i >= len(v):
        return "\0"
    return v[i]


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _contains(v: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    target = v[start:start + length]
    return target in criteria


def double_metaphone(value: str | None, max_code_len: int = 4, alternate: bool = False) -> str:
    """Primary (or alternate) Double Metaphone code, commons-codec semantics."""
    if value is None:
        return ""
    value = value.strip().upper()
    if not value:
        return ""

    slavo_germanic = (
        "W" in value or "K" in value or "CZ" in value or "WITZ" in value
    )
    index = 1 if value.startswith(_SILENT_START) else 0
    result = _Result(max_code_len)
    n = len(value)

    while not result.is_complete() and index <= n - 1:
        ch = value[index]
        if ch in "AEIOUY":
            if index == 0:
                result.append("A")
            index += 1
        elif ch == "B":
            result.append("P")
            index += 2 if _char_at(value, index + 1) == "B" else 1
        elif ch == "\xc7":  # Ç
            result.append("S")
            index += 1
        elif ch == "C":
            index = _handle_c(value, result, index)
        elif ch == "D":
            index = _handle_d(value, result, index)
        elif ch == "F":
            result.append("F")
            index += 2 if _char_at(value, index + 1) == "F" else 1
        elif ch == "G":
            index = _handle_g(value, result, index, slavo_germanic)
        elif ch == "H":
            index = _handle_h(value, result, index)
        elif ch == "J":
            index = _handle_j(value, result, index, slavo_germanic)
        elif ch == "K":
            result.append("K")
            index += 2 if _char_at(value, index + 1) == "K" else 1
        elif ch == "L":
            index = _handle_l(value, result, index)
        elif ch == "M":
            result.append("M")
            index += 2 if _condition_m0(value, index) else 1
        elif ch == "N":
            result.append("N")
            index += 2 if _char_at(value, index + 1) == "N" else 1
        elif ch == "\xd1":  # Ñ
            result.append("N")
            index += 1
        elif ch == "P":
            index = _handle_p(value, result, index)
        elif ch == "Q":
            result.append("K")
            index += 2 if _char_at(value, index + 1) == "Q" else 1
        elif ch == "R":
            index = _handle_r(value, result, index, slavo_germanic)
        elif ch == "S":
            index = _handle_s(value, result, index, slavo_germanic)
        elif ch == "T":
            index = _handle_t(value, result, index)
        elif ch == "V":
            result.append("F")
            index += 2 if _char_at(value, index + 1) == "V" else 1
        elif ch == "W":
            index = _handle_w(value, result, index)
        elif ch == "X":
            index = _handle_x(value, result, index)
        elif ch == "Z":
            index = _handle_z(value, result, index, slavo_germanic)
        else:
            index += 1

    return "".join(result.alternate if alternate else result.primary)


def _handle_c(v: str, r: _Result, i: int) -> int:
    if _condition_c0(v, i):
        r.append("K")
        i += 2
    elif i == 0 and _contains(v, i, 6, "CAESAR"):
        r.append("S")
        i += 2
    elif _contains(v, i, 2, "CH"):
        i = _handle_ch(v, r, i)
    elif _contains(v, i, 2, "CZ") and not _contains(v, i - 2, 4, "WICZ"):
        r.append("S", "X")
        i += 2
    elif _contains(v, i + 1, 3, "CIA"):
        r.append("X")
        i += 3
    elif _contains(v, i, 2, "CC") and not (i == 1 and _char_at(v, 0) == "M"):
        return _handle_cc(v, r, i)
    elif _contains(v, i, 2, "CK", "CG", "CQ"):
        r.append("K")
        i += 2
    elif _contains(v, i, 2, "CI", "CE", "CY"):
        if _contains(v, i, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        i += 2
    else:
        r.append("K")
        if _contains(v, i + 1, 2, " C", " Q", " G"):
            i += 3
        elif _contains(v, i + 1, 1, "C", "K", "Q") and not _contains(v, i + 1, 2, "CE", "CI"):
            i += 2
        else:
            i += 1
    return i


def _condition_c0(v: str, i: int) -> bool:
    if _contains(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_char_at(v, i - 2)):
        return False
    if not _contains(v, i - 1, 3, "ACH"):
        return False
    c = _char_at(v, i + 2)
    return (c != "I" and c != "E") or _contains(v, i - 2, 6, "BACHER", "MACHER")


def _handle_cc(v: str, r: _Result, i: int) -> int:
    if _contains(v, i + 2, 1, "I", "E", "H") and not _contains(v, i + 2, 2, "HU"):
        if (i == 1 and _char_at(v, i - 1) == "A") or _contains(v, i - 1, 5, "UCCEE", "UCCES"):
            r.append("KS")
        else:
            r.append("X")
        i += 3
    else:
        r.append("K")
        i += 2
    return i


def _handle_ch(v: str, r: _Result, i: int) -> int:
    if i > 0 and _contains(v, i, 4, "CHAE"):
        r.append("K", "X")
        return i + 2
    if _condition_ch0(v, i):
        r.append("K")
        return i + 2
    if _condition_ch1(v, i):
        r.append("K")
        return i + 2
    if i > 0:
        if _contains(v, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return i + 2


def _condition_ch0(v: str, i: int) -> bool:
    if i != 0:
        return False
    if not _contains(v, i + 1, 5, "HARAC", "HARIS") and not _contains(
        v, i + 1, 3, "HOR", "HYM", "HIA", "HEM"
    ):
        return False
    return not _contains(v, 0, 5, "CHORE")


def _condition_ch1(v: str, i: int) -> bool:
    return (
        _contains(v, 0, 4, "VAN ", "VON ")
        or _contains(v, 0, 3, "SCH")
        or _contains(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or _contains(v, i + 2, 1, "T", "S")
        or (
            (_contains(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
            and (
                _contains(v, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                or i + 1 == len(v) - 1
            )
        )
    )


def _handle_d(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "DG"):
        if _contains(v, i + 2, 1, "I", "E", "Y"):
            r.append("J")
            i += 3
        else:
            r.append("TK")
            i += 2
    elif _contains(v, i, 2, "DT", "DD"):
        r.append("T")
        i += 2
    else:
        r.append("T")
        i += 1
    return i


def _handle_g(v: str, r: _Result, i: int, sg: bool) -> int:
    if _char_at(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _char_at(v, i + 1) == "N":
        if i == 1 and _is_vowel(_char_at(v, 0)) and not sg:
            r.append("KN", "N")
        elif not _contains(v, i + 2, 2, "EY") and _char_at(v, i + 1) != "Y" and not sg:
            r.append("N", "KN")
        else:
            r.append("KN")
        return i + 2
    if _contains(v, i + 1, 2, "LI") and not sg:
        r.append("KL", "L")
        return i + 2
    if i == 0 and (
        _char_at(v, i + 1) == "Y"
        or _contains(v, i + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
    ):
        r.append("K", "J")
        return i + 2
    if (
        (_contains(v, i + 1, 2, "ER") or _char_at(v, i + 1) == "Y")
        and not _contains(v, 0, 6, "DANGER", "RANGER", "MANGER")
        and not _contains(v, i - 1, 1, "E", "I")
        and not _contains(v, i - 1, 3, "RGY", "OGY")
    ):
        r.append("K", "J")
        return i + 2
    if _contains(v, i + 1, 1, "E", "I", "Y") or _contains(v, i - 1, 4, "AGGI", "OGGI"):
        if _contains(v, 0, 4, "VAN ", "VON ") or _contains(v, 0, 3, "SCH") or _contains(
            v, i + 1, 2, "ET"
        ):
            r.append("K")
        elif _contains(v, i + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return i + 2
    if _char_at(v, i + 1) == "G":
        r.append("K")
        return i + 2
    r.append("K")
    return i + 1


def _handle_gh(v: str, r: _Result, i: int) -> int:
    if i > 0 and not _is_vowel(_char_at(v, i - 1)):
        r.append("K")
        return i + 2
    if i == 0:
        if _char_at(v, i + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return i + 2
    if (
        (i > 1 and _contains(v, i - 2, 1, "B", "H", "D"))
        or (i > 2 and _contains(v, i - 3, 1, "B", "H", "D"))
        or (i > 3 and _contains(v, i - 4, 1, "B", "H"))
    ):
        return i + 2
    if i > 2 and _char_at(v, i - 1) == "U" and _contains(v, i - 3, 1, "C", "G", "L", "R", "T"):
        r.append("F")
    elif i > 0 and _char_at(v, i - 1) != "I":
        r.append("K")
    return i + 2


def _handle_h(v: str, r: _Result, i: int) -> int:
    if (i == 0 or _is_vowel(_char_at(v, i - 1))) and _is_vowel(_char_at(v, i + 1)):
        r.append("H")
        return i + 2
    return i + 1


def _handle_j(v: str, r: _Result, i: int, sg: bool) -> int:
    if _contains(v, i, 4, "JOSE") or _contains(v, 0, 4, "SAN "):
        if (i == 0 and _char_at(v, i + 4) == " ") or len(v) == 4 or _contains(v, 0, 4, "SAN "):
            r.append("H")
        else:
            r.append("J", "H")
        return i + 1
    if i == 0 and not _contains(v, i, 4, "JOSE"):
        r.append("J", "A")
    elif (
        _is_vowel(_char_at(v, i - 1))
        and not sg
        and (_char_at(v, i + 1) == "A" or _char_at(v, i + 1) == "O")
    ):
        r.append("J", "H")
    elif i == len(v) - 1:
        r.append("J", " ")
    elif not _contains(v, i + 1, 1, *_L_T_K_S_N_M_B_Z) and not _contains(
        v, i - 1, 1, "S", "K", "L"
    ):
        r.append("J")
    return i + 2 if _char_at(v, i + 1) == "J" else i + 1


def _handle_l(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 1) == "L":
        if _condition_l0(v, i):
            r.append_primary("L")
        else:
            r.append("L")
        return i + 2
    r.append("L")
    return i + 1


def _condition_l0(v: str, i: int) -> bool:
    if i == len(v) - 3 and _contains(v, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return (
        _contains(v, len(v) - 2, 2, "AS", "OS") or _contains(v, len(v) - 1, 1, "A", "O")
    ) and _contains(v, i - 1, 4, "ALLE")


def _condition_m0(v: str, i: int) -> bool:
    if _char_at(v, i + 1) == "M":
        return True
    return _contains(v, i - 1, 3, "UMB") and (
        i + 1 == len(v) - 1 or _contains(v, i + 2, 2, "ER")
    )


def _handle_p(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 1) == "H":
        r.append("F")
        return i + 2
    r.append("P")
    return i + 2 if _contains(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v: str, r: _Result, i: int, sg: bool) -> int:
    if (
        i == len(v) - 1
        and not sg
        and _contains(v, i - 2, 2, "IE")
        and not _contains(v, i - 4, 2, "ME", "MA")
    ):
        r.append_alternate("R")
    else:
        r.append("R")
    return i + 2 if _char_at(v, i + 1) == "R" else i + 1


def _handle_s(v: str, r: _Result, i: int, sg: bool) -> int:
    if _contains(v, i - 1, 3, "ISL", "YSL"):
        return i + 1
    if i == 0 and _contains(v, i, 5, "SUGAR"):
        r.append("X", "S")
        return i + 1
    if _contains(v, i, 2, "SH"):
        if _contains(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")
        else:
            r.append("X")
        return i + 2
    if _contains(v, i, 3, "SIO", "SIA") or _contains(v, i, 4, "SIAN"):
        if sg:
            r.append("S")
        else:
            r.append("S", "X")
        return i + 3
    if (i == 0 and _contains(v, i + 1, 1, "M", "N", "L", "W")) or _contains(v, i + 1, 1, "Z"):
        r.append("S", "X")
        return i + 2 if _contains(v, i + 1, 1, "Z") else i + 1
    if _contains(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _contains(v, i - 2, 2, "AI", "OI"):
        r.append_alternate("S")
    else:
        r.append("S")
    return i + 2 if _contains(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 2) == "H":
        if _contains(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(v, i + 3, 2, "ER", "EN"):
                r.append("X", "SK")
            else:
                r.append("SK")
        else:
            if i == 0 and not _is_vowel(_char_at(v, 3)) and _char_at(v, 3) != "W":
                r.append("X", "S")
            else:
                r.append("X")
        return i + 3
    if _contains(v, i + 2, 1, "I", "E", "Y"):
        r.append("S")
        return i + 3
    r.append("SK")
    return i + 3


def _handle_t(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 4, "TION"):
        r.append("X")
        return i + 3
    if _contains(v, i, 3, "TIA", "TCH"):
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "TH") or _contains(v, i, 3, "TTH"):
        if _contains(v, i + 2, 2, "OM", "AM") or _contains(v, 0, 4, "VAN ", "VON ") or _contains(
            v, 0, 3, "SCH"
        ):
            r.append("T")
        else:
            r.append("0", "T")
        return i + 2
    r.append("T")
    return i + 2 if _contains(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "WR"):
        r.append("R")
        return i + 2
    if i == 0 and (_is_vowel(_char_at(v, i + 1)) or _contains(v, i, 2, "WH")):
        if _is_vowel(_char_at(v, i + 1)):
            r.append("A", "F")
        else:
            r.append("A")
        return i + 1
    if (
        (i == len(v) - 1 and _is_vowel(_char_at(v, i - 1)))
        or _contains(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or _contains(v, 0, 3, "SCH")
    ):
        r.append_alternate("F")
        return i + 1
    if _contains(v, i, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return i + 4
    return i + 1


def _handle_x(v: str, r: _Result, i: int) -> int:
    if i == 0:
        r.append("S")
        return i + 1
    if not (
        i == len(v) - 1
        and (_contains(v, i - 3, 3, "IAU", "EAU") or _contains(v, i - 2, 2, "AU", "OU"))
    ):
        r.append("KS")
    return i + 2 if _contains(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v: str, r: _Result, i: int, sg: bool) -> int:
    if _char_at(v, i + 1) == "H":
        r.append("J")
        return i + 2
    if _contains(v, i + 1, 2, "ZO", "ZI", "ZA") or (sg and i > 0 and _char_at(v, i - 1) != "T"):
        r.append("S", "TS")
    else:
        r.append("S")
    return i + 2 if _char_at(v, i + 1) == "Z" else i + 1


def dmeta_code_from_simple(simple: str) -> str:
    """Reference ``mod.rs:429-438``: phonetic-normalize a
    ``normalize_simple`` string, return '' if empty, else the primary
    Double Metaphone code."""
    from .normalize import normalize_for_phonetic

    phonetic = normalize_for_phonetic(simple)
    if not phonetic:
        return ""
    return double_metaphone(phonetic)
