"""Single-node reference oracle + seeded fixture generator.

Pure-Python faithful re-implementations of every matching algorithm,
used ONLY by tests and golden-fixture generation: the Spark engine's
outputs are asserted pair-for-pair (ids, confidence, labels) against
these.  Each function mirrors the reference routine it is named after
(file:line in docstrings).  Nothing here runs in the distributed path.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import date, timedelta

from .functions.normalize import normalize_text
from .functions.phonetics import soundex4_ascii
from .functions.scoring import PersonCache, classify_cached_full, classify_cached_no_mid
from .functions.similarity import jaro_winkler, sim_levenshtein_pct
from .operators.dates import birthdate_keys, birthdate_matches_naive, swap_month_day

__all__ = ["Person", "generate_persons", "oracle_algo1", "oracle_algo2",
           "oracle_fuzzy", "oracle_fuzzy_no_mid", "oracle_lev_weighted",
           "oracle_households", "oracle_cascade"]

PREFILTER = 84.0  # FUZZY_PREFILTER_KEEP_THRESHOLD (mod.rs:65)


@dataclass
class Person:
    id: int
    uuid: str | None = None
    first_name: str | None = None
    middle_name: str | None = None
    last_name: str | None = None
    birthdate: date | None = None
    hh_id: str | None = None
    barangay_code: str | None = None
    city_code: str | None = None

    def normalized(self) -> tuple[str | None, str | None, str | None]:
        return (
            normalize_text(self.first_name),
            normalize_text(self.middle_name),
            normalize_text(self.last_name),
        )


def oracle_algo1(t1: list[Person], t2: list[Person], allow_swap: bool = False) -> list[tuple[int, int]]:
    """matches_algo1 over all pairs (mod.rs:2148-2178, default env)."""
    out = []
    for a in t1:
        fa, _, la = a.normalized()
        for b in t2:
            fb, _, lb = b.normalized()
            if a.birthdate is None or b.birthdate is None:
                continue
            if not birthdate_matches_naive(a.birthdate, b.birthdate, allow_swap):
                continue
            if fa is not None and fb is not None and fa == fb and la is not None and lb is not None and la == lb:
                out.append((a.id, b.id))
    return out


def oracle_algo2(t1: list[Person], t2: list[Person], allow_swap: bool = False) -> list[tuple[int, int]]:
    """matches_algo2 (mod.rs:2179-2223): middle None==None ok, Some vs
    None fails."""
    out = []
    for a in t1:
        fa, ma, la = a.normalized()
        for b in t2:
            fb, mb, lb = b.normalized()
            if a.birthdate is None or b.birthdate is None:
                continue
            if not birthdate_matches_naive(a.birthdate, b.birthdate, allow_swap):
                continue
            if not (fa is not None and fa == fb and la is not None and la == lb):
                continue
            if (ma is None) != (mb is None) or (ma is not None and ma != mb):
                continue
            out.append((a.id, b.id))
    return out


def _block_parts(p: Person) -> tuple[int, str, str, str] | None:
    """(year, first_init, last_init, soundex) from NORMALIZED names
    (mod.rs:2769-2789)."""
    fn_, _, ln_ = p.normalized()
    if p.birthdate is None or fn_ is None or ln_ is None:
        return None

    def init(s: str) -> str:
        for b in s.encode("utf-8"):
            if 65 <= b <= 90 or 97 <= b <= 122:
                return chr(b).upper()
        return "?"

    return (p.birthdate.year, init(fn_), init(ln_), soundex4_ascii(ln_))


def oracle_fuzzy(
    t1: list[Person], t2: list[Person], allow_swap: bool = False
) -> list[tuple[int, int, float, str]]:
    """match_fuzzy_cpu_gpu_equivalent (mod.rs:2747-2903)."""
    block: dict[tuple, list[int]] = {}
    for j, p in enumerate(t2):
        k = _block_parts(p)
        if k is not None:
            block.setdefault(k, []).append(j)
    c1 = [PersonCache(p.first_name, p.middle_name, p.last_name) for p in t1]
    c2 = [PersonCache(p.first_name, p.middle_name, p.last_name) for p in t2]
    out = []
    for i, a in enumerate(t1):
        k = _block_parts(a)
        if k is None:
            continue
        cands = list(block.get(k, []))
        if not cands:
            cands = list(block.get((k[0], "?", k[2], k[3]), []))
        if not cands:
            cands = list(block.get((k[0], k[1], k[2], k[3][:2] + "00"), []))
        for j in cands:
            s1, s2 = c1[i].simple_full, c2[j].simple_full
            prelim = max(sim_levenshtein_pct(s1, s2), jaro_winkler(s1, s2) * 100.0)
            if prelim < PREFILTER:
                continue
            b = t2[j]
            if a.birthdate is None or b.birthdate is None:
                continue
            if not birthdate_matches_naive(a.birthdate, b.birthdate, allow_swap):
                continue
            r = classify_cached_full(c1[i], c2[j])
            if r is not None:
                out.append((a.id, b.id, r[0] / 100.0, r[1]))
    return out


def oracle_fuzzy_no_mid(
    t1: list[Person], t2: list[Person], allow_swap: bool = False
) -> list[tuple[int, int, float, str]]:
    """match_fuzzy_no_mid_cpu_gpu_equivalent (mod.rs:2906-3013)."""
    by_bd: dict[date, list[int]] = {}
    for j, p in enumerate(t2):
        if p.birthdate is not None:
            by_bd.setdefault(p.birthdate, []).append(j)
    c1 = [PersonCache(p.first_name, p.middle_name, p.last_name) for p in t1]
    c2 = [PersonCache(p.first_name, p.middle_name, p.last_name) for p in t2]
    out = []
    for i, a in enumerate(t1):
        if a.birthdate is None:
            continue
        cands = list(by_bd.get(a.birthdate, []))
        if allow_swap:
            sw = swap_month_day(a.birthdate)
            if sw is not None and sw != a.birthdate:
                cands.extend(by_bd.get(sw, []))
        for j in cands:
            s1, s2 = c1[i].simple_full_no_mid, c2[j].simple_full_no_mid
            prelim = max(sim_levenshtein_pct(s1, s2), jaro_winkler(s1, s2) * 100.0)
            if prelim < PREFILTER:
                continue
            r = classify_cached_no_mid(c1[i], c2[j])
            if r is not None:
                out.append((a.id, t2[j].id, r[0] / 100.0, r[1]))
    return out


def oracle_lev_weighted(
    t1: list[Person], t2: list[Person]
) -> list[tuple[int, int, float, tuple[str, ...]]]:
    """match_levenshtein_weighted_cpu (mod.rs:3016-3217)."""
    from .functions.normalize import normalize_simple

    def cache(p: Person):
        af = normalize_simple(p.first_name or "")
        am = normalize_simple(p.middle_name or "")
        al = normalize_simple(p.last_name or "")
        return af, am, al, af[:3], al[:3], soundex4_ascii(af), soundex4_ascii(al), (
            soundex4_ascii(am) if am else None
        )

    cc2 = [cache(p) for p in t2]
    ix_sx: dict[tuple, list[int]] = {}
    ix_pf: dict[tuple, list[int]] = {}
    ix_mid: dict[tuple, list[int]] = {}
    for j, (p, c) in enumerate(zip(t2, cc2)):
        if p.birthdate is None:
            continue
        dk = p.birthdate.isoformat()
        af, am, al, af3, al3, sxf, sxl, sxm = c
        ix_sx.setdefault((dk, sxf, sxl), []).append(j)
        if af3 and al3:
            ix_pf.setdefault((dk, af3, al3), []).append(j)
        if am:
            ix_mid.setdefault((dk, sxm), []).append(j)
    out = []
    for a in t1:
        if a.birthdate is None:
            continue
        af, am, al, af3, al3, sxf, sxl, sxm = cache(a)
        dk = a.birthdate.isoformat()
        cand: set[int] = set()
        cand.update(ix_sx.get((dk, sxf, sxl), []))
        if af3 and al3:
            cand.update(ix_pf.get((dk, af3, al3), []))
        if sxm is not None:
            cand.update(ix_mid.get((dk, sxm), []))
        for j in sorted(cand):
            b = t2[j]
            if b.birthdate != a.birthdate:
                continue
            bf, bm, bl = cc2[j][0], cc2[j][1], cc2[j][2]
            mid_present = bool(am) and bool(bm)
            last_sim = sim_levenshtein_pct(al, bl)
            first_sim = sim_levenshtein_pct(af, bf)
            mid_sim = sim_levenshtein_pct(am, bm) if mid_present else 0.0
            denom = 3.0 if mid_present else 2.0
            conf = ((last_sim + first_sim + (mid_sim if mid_present else 0.0)) / denom) / 100.0
            fields = []
            if af == bf:
                fields.append("FirstName")
            if am == bm:
                fields.append("MiddleName")
            if al == bl:
                fields.append("LastName")
            fields.append("Birthdate")
            out.append((a.id, b.id, conf, tuple(fields)))
    return out


def oracle_households(
    t1: list[Person],
    t2: list[Person],
    min_conf: float,
    option: int = 5,
    allow_swap: bool = False,
) -> list[tuple[int, str, int, float]]:
    """match_households_gpu_inmemory[_opt6] (mod.rs:591-835, :840-1092):
    FuzzyNoMiddle pairs -> best-1 assignment with the reference's
    arrival-order tie semantics -> group -> pct > 50 -> sorted rows
    (row_id, uuid, hh_id, match_percentage)."""
    pairs = oracle_fuzzy_no_mid(t1, t2, allow_swap)
    p1 = {p.id: p for p in t1}
    p2 = {p.id: p for p in t2}

    best: dict[int, list] = {}  # person -> [group_key, other_key, conf, tie]
    for a_id, b_id, conf, _label in pairs:
        if conf < min_conf:
            continue
        uuid = p1[a_id].uuid
        if uuid is None:
            continue
        hh = p2[b_id].hh_id if p2[b_id].hh_id is not None else str(b_id)
        if option == 5:
            key, grp, other = a_id, hh, uuid  # best hh per t1 person
        else:
            key, grp, other = b_id, uuid, hh  # best uuid per t2 person
        cur = best.get(key)
        if cur is None:
            best[key] = [grp, other, conf, False]
        else:
            if conf > cur[2]:
                best[key] = [grp, other, conf, False]
            elif conf == cur[2]:
                if grp < cur[0]:
                    best[key] = [grp, other, conf, False]
                elif grp != cur[0]:
                    cur[3] = True

    matched: dict[tuple[str, str], set[int]] = {}
    for key, (grp, other, _conf, tie) in best.items():
        if tie:
            continue
        if option == 5:
            matched.setdefault((other, grp), set()).add(key)  # (uuid, hh)
        else:
            matched.setdefault((other, grp), set()).add(key)  # (hh_key, uuid)

    if option == 5:
        totals: dict[str, int] = {}
        for p in t1:
            if p.uuid is not None:
                totals[p.uuid] = totals.get(p.uuid, 0) + 1
    else:
        totals = {}
        for p in t2:
            k = p.hh_id if p.hh_id is not None else str(p.id)
            totals[k] = totals.get(k, 0) + 1
    # BTreeMap iteration order: (uuid, hh) for opt5, (hh_key, uuid) for opt6
    iter_keys = sorted(matched)

    out = []
    row_id = 1
    for k in iter_keys:
        if option == 5:
            uuid, hh = k
        else:
            hh, uuid = k
        total = totals.get(hh if option == 6 else uuid, 0)
        if total <= 0:
            continue
        pct = len(matched[k]) / total * 100.0
        if pct > 50.0:
            try:
                hh_num = int(hh)
            except ValueError:
                hh_num = 0
            out.append((row_id, uuid, hh_num, pct))
            row_id += 1
    out.sort(key=lambda r: (r[1], r[2]))
    return out


def oracle_cascade(
    t1: list[Person],
    t2: list[Person],
    levels: list[int],
    threshold: float = 0.95,
    allow_swap: bool = False,
    exclusive: bool = True,
) -> dict[int, list[tuple[int, int]]]:
    """run_cascade_inmemory (cascade.rs:622-903): per-level exact-key /
    fuzzy matching with exclusive-mode id subtraction between levels."""
    from .functions.normalize import is_full_middle, middle_initials, normalize_text

    def exact_key(p: Person, level: int) -> str | None:
        f, m, l = p.normalized()
        if f is None or l is None:
            return None
        bd = p.birthdate.isoformat() if p.birthdate else None
        brgy = normalize_text(p.barangay_code) if p.barangay_code else None
        city = normalize_text(p.city_code) if p.city_code else None
        mfull = m if (m is not None and is_full_middle(m)) else None
        mi = middle_initials(m) if m is not None else None
        spec = {
            1: (mfull, bd), 2: (mi, bd), 3: (None, bd),
            4: (mfull, brgy), 5: (mi, brgy), 6: (None, brgy),
            7: (mfull, city), 8: (mi, city), 9: (None, city),
        }[level]
        mid_part, tail = spec
        if tail is None:
            return None
        if level in (1, 2, 4, 5, 7, 8):
            if mid_part is None:
                return None
            return f"{f}|{l}|{mid_part}|{tail}"
        return f"{f}|{l}|{tail}"

    rem1, rem2 = list(t1), list(t2)
    out: dict[int, list[tuple[int, int]]] = {}
    for level in levels:
        matches: list[tuple[int, int]] = []
        if level in (10, 11):
            swap = allow_swap if level == 10 else False
            c1 = {p.id: PersonCache(p.first_name, p.middle_name, p.last_name) for p in rem1}
            c2 = {p.id: PersonCache(p.first_name, p.middle_name, p.last_name) for p in rem2}
            for a in rem1:
                if a.birthdate is None:
                    continue
                if level == 10 and not is_full_middle((a.middle_name or "").strip()):
                    continue
                for b in rem2:
                    if b.birthdate is None:
                        continue
                    if level == 10 and not is_full_middle((b.middle_name or "").strip()):
                        continue
                    if not birthdate_matches_naive(a.birthdate, b.birthdate, swap):
                        continue
                    res = (
                        classify_cached_full(c1[a.id], c2[b.id])
                        if level == 10
                        else classify_cached_no_mid(c1[a.id], c2[b.id])
                    )
                    if res is None or res[0] / 100.0 < threshold:
                        continue
                    matches.append((a.id, b.id))
        else:
            idx: dict[str, list[int]] = {}
            for b in rem2:
                k = exact_key(b, level)
                if k is not None:
                    idx.setdefault(k, []).append(b.id)
            for a in rem1:
                k = exact_key(a, level)
                if k is not None:
                    for b_id in idx.get(k, []):
                        matches.append((a.id, b_id))
        matches.sort()
        out[level] = matches
        if exclusive and matches:
            m1 = {a for a, _ in matches}
            m2 = {b for _, b in matches}
            rem1 = [p for p in rem1 if p.id not in m1]
            rem2 = [p for p in rem2 if p.id not in m2]
    return out


# ---------------------------------------------------------------------------
# Seeded fixture generator — mirrors the spirit of the reference's
# seed-42 household generator (src/bin/seed.rs:64-230): households of
# 2-5 members, ~30% matchy vs a table-B representative with
# edit-distance-1 variants, ~40% of those with swapped birthdates,
# ~25% middle-less.
# ---------------------------------------------------------------------------

_FIRST = [
    "Maria", "Jose", "Juan", "Ana", "Cristina", "Kristine", "John", "Jon",
    "Michael", "Sarah", "Álvaro", "José", "Łukasz", "Sofia", "Miguel",
    "Isabel", "Pedro", "Carmen", "Luis", "Rosa",
]
_MIDDLE = ["Santos", "Cruz", "Reyes", "M", "Mae", "de la", None, "Garcia"]
_LAST = [
    "Santos", "Dela Cruz", "De la Cruz", "Reyes", "Garcia", "Smith", "Smyth",
    "Mendoza", "Torres", "Fernandez", "O'Brien", "Müller", "Ramos",
]


def _typo(rng: random.Random, s: str) -> str:
    """Edit-distance-1 variant (seed.rs / benchmarking mod.rs:845-847)."""
    k = rng.randrange(3)
    if k == 0:
        return s + "h"
    if k == 1 and len(s) > 2:
        i = rng.randrange(1, len(s) - 1)
        return s[:i] + s[i + 1:]
    return s[0] + s[1:].capitalize() if s else s


def generate_persons(
    n_households: int, seed: int = 42
) -> tuple[list[Person], list[Person]]:
    """Deterministic (table1, table2) with known overlap structure."""
    rng = random.Random(seed)
    t1: list[Person] = []
    t2: list[Person] = []
    pid1, pid2 = 1, 100_000
    for h in range(n_households):
        last = rng.choice(_LAST)
        uuid = f"uuid-{h:05d}"
        hh = f"{2000 + h}"
        base = date(1950, 1, 1) + timedelta(days=rng.randrange(20000))
        members = rng.randrange(2, 6)
        matchy = rng.random() < 0.30
        rep_done = False
        for m in range(members):
            first = rng.choice(_FIRST)
            mid = rng.choice(_MIDDLE) if rng.random() > 0.25 else None
            bd = base + timedelta(days=rng.randrange(0, 60))
            t1.append(
                Person(
                    id=pid1, uuid=uuid, first_name=first, middle_name=mid,
                    last_name=last, birthdate=bd, hh_id=None,
                    barangay_code=f"B{rng.randrange(1, 501):04d}",
                    city_code=f"C{rng.randrange(1, 121):03d}",
                )
            )
            pid1 += 1
            if matchy and (rng.random() < 0.6 or not rep_done):
                rep_done = True
                v_first = _typo(rng, first) if rng.random() < 0.5 else first
                v_bd = bd
                if rng.random() < 0.4:
                    sw = swap_month_day(bd)
                    if sw is not None:
                        v_bd = sw
                t2.append(
                    Person(
                        id=pid2, uuid=None, first_name=v_first, middle_name=mid,
                        last_name=last, birthdate=v_bd, hh_id=hh,
                        barangay_code=f"B{rng.randrange(1, 501):04d}",
                        city_code=f"C{rng.randrange(1, 121):03d}",
                    )
                )
                pid2 += 1
        # noise rows in t2
        if rng.random() < 0.5:
            t2.append(
                Person(
                    id=pid2, uuid=None, first_name=rng.choice(_FIRST),
                    middle_name=rng.choice(_MIDDLE), last_name=rng.choice(_LAST),
                    birthdate=date(1950, 1, 1) + timedelta(days=rng.randrange(20000)),
                    hh_id=f"{9000 + h}",
                )
            )
            pid2 += 1
    return t1, t2
