"""Deterministic corpus sampling: hash sampling, stratified rates,
and train/val/test split assignment.

A 100 TB training-data pipeline downsamples and splits by CONTENT KEY,
never by `rand()`: the decision for a row must be reproducible across
reruns, engines, partitionings, and incremental re-ingests (a page
re-crawled tomorrow must land in the same split it landed in today).
Everything here derives a 32-bit bucket from ``md5(key ':' seed)`` and
compares it against integer thresholds precomputed in exact arithmetic
— no floats anywhere in the decision path, so results are
bit-reproducible and independently replayable in any engine with md5
(the DuckDB oracles replay the same predicate).

All three operators are pure Column expressions over one scan: no
shuffle, no Python, fully codegen — at any corpus size they are
scan-bound, and the sampling predicate pushes into the scan filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket32",
    "hash_sample",
    "stratified_sample",
    "split_assign",
    "split_bounds",
    "temperature_sample",
    "temperature_thresholds",
]

_B32 = 1 << 32


def _threshold(rate: float) -> int:
    """Exact integer threshold for a keep-rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return round(rate * _B32)


def split_bounds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """The canonical (name, upper_bound) layout for ``split_assign``'s
    cumulative bucket ranges — the LAST split's bound is 2^32 (it
    absorbs rounding remainder).  Oracle builders MUST derive their
    CASE thresholds from this same function or their replayed split
    drifts from the engine's."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    out: list[tuple[str, int]] = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        out.append((name, _threshold(acc)))
    out.append((names[-1], _B32))
    return out


def hash_bucket32(key: Column, seed: str = "") -> Column:
    """Uniform 32-bit bucket from md5(key ':' seed) — the first 8 hex
    chars as an integer.  Engine-portable (md5 is everywhere) and
    stable forever, unlike hash()/xxhash64 whose seeds are
    implementation details."""
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: str = ""
) -> DataFrame:
    """Keep each row iff bucket(key) < round(rate * 2^32).  Exact,
    deterministic, idempotent — rerunning over a grown corpus keeps
    every previously-kept row."""
    return df.where(hash_bucket32(F.col(key_col), seed) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum keep-rates (e.g. ``{"en": 0.1, "de": 0.5}``) — the
    language-rebalancing downsample every multilingual corpus build
    runs.  Strata absent from ``rates`` get ``default_rate``.  The
    rate map compiles to a CASE chain (strata counts are small);
    thresholds are exact integers."""
    thr: Column = F.lit(_threshold(default_rate))
    for stratum in sorted(rates):  # deterministic compile order
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_threshold(rates[stratum]))
        ).otherwise(thr)
    return df.where(hash_bucket32(F.col(key_col), seed) < thr)


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative
    bucket ranges (e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``).
    Weights must sum to 1 (±1e-9); the last split absorbs the
    rounding remainder so the ranges exactly tile [0, 2^32).

    NULL keys get a NULL split (md5(NULL) is NULL, there is no content
    key to decide by) — consistent with hash_sample /
    stratified_sample, where a NULL key never satisfies the keep
    predicate.  Validate or filter upstream if nulls are unexpected.
    """
    bounds = split_bounds(weights)  # validates weights
    bucket = hash_bucket32(F.col(key_col), seed)
    # wrap back-to-front so the OUTERMOST when tests the lowest bound;
    # a NULL bucket fails every WHEN and falls through to NULL (never
    # to the last split)
    expr: Column = F.when(bucket.isNotNull(), F.lit(bounds[-1][0]))
    for name, ub in reversed(bounds[:-1]):
        expr = F.when(bucket < F.lit(ub), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


#: quantization scale for the temperature sampler's per-stratum
#: weights: floor(p^alpha * 2^20) keeps every product in the rate
#: formula inside int64 up to ~10^9-row strata
TEMP_Q_SCALE = 1 << 20


def temperature_thresholds(
    counts: dict, budget_frac: float, alpha: float = 0.5
) -> dict:
    """Per-stratum integer keep-thresholds for temperature sampling
    (the multilingual LM rebalancing rule: sample stratum ``l`` with
    probability ∝ ``p_l^alpha`` — alpha<1 upweights low-resource
    strata).  Given stratum sizes ``n_l``: target share
    ``q_l ∝ (n_l/N)^alpha``, budget ``B = floor(budget_frac * N)``,
    keep rate ``r_l = min(1, B*q_l / n_l)``; strata that cap at rate 1
    under-fill the budget (no iterative reallocation — deterministic
    and replayable beats budget-exact here).

    Exactness: ``q`` is quantized to ``floor(p^alpha * 2^20)``
    integers, the normalizer is an INTEGER sum (order-free), and the
    rate is one division of two ints EACH cast to double first (two
    correctly-rounded steps any engine reproduces — NOT Python's
    exact-rational int/int division, which differs above 2^53).  With
    the default ``alpha=0.5`` the power is ``sqrt`` — correctly
    rounded by IEEE in every engine, so the whole decision is
    bit-replayable in SQL; other alphas go through ``pow``, which is
    near-correctly-rounded but not an exactness contract."""
    import math

    if not 0.0 <= budget_frac <= 1.0:
        raise ValueError(f"budget_frac must be in [0, 1], got {budget_frac}")
    n_total = sum(counts.values())
    if n_total == 0:
        return {}
    budget = math.floor(budget_frac * n_total)
    q_fx = {}
    for stratum, n in counts.items():
        p = n / n_total
        root = math.sqrt(p) if alpha == 0.5 else p**alpha
        # floor(1) for a PRESENT stratum: below p ~ 2^-40 the
        # quantized share would hit 0 and silently drop an ultra-rare
        # language entirely — the opposite of what temperature
        # sampling is for (the oracle applies the same GREATEST)
        q_fx[stratum] = max(1, math.floor(root * TEMP_Q_SCALE))
    d_fx = sum(q_fx.values())
    out = {}
    for stratum, n in counts.items():
        r = min(
            1.0, float(budget * q_fx[stratum]) / float(n * d_fx)
        )
        out[stratum] = math.floor(r * _B32)
    return out


def temperature_sample(
    df: DataFrame,
    budget_frac: float,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep rows by temperature-rebalanced per-stratum rates (see
    :func:`temperature_thresholds`): one small groupBy to learn the
    stratum sizes (collected — strata are languages/sources, a tiny
    dim), then the same codegen'd md5-bucket scan filter as
    ``stratified_sample``.  NULL strata are dropped (no size to
    rebalance by).  Decisions are md5-stable: rerunning over a grown
    corpus keeps every previously-kept row whose stratum rate did not
    shrink."""
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    thresholds = temperature_thresholds(counts, budget_frac, alpha)
    thr: Column = F.lit(0)
    for stratum in sorted(thresholds):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(thresholds[stratum])
        ).otherwise(thr)
    return df.where(hash_bucket32(F.col(key_col), seed) < thr)
