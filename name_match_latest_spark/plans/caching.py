"""Persist bookkeeping (round-1 finding: cache leaks).

Some operators ``persist()`` DataFrames whose lifetime extends past
their function return — the blocked fuzzy matchers cache the
per-person UDF materialization that three join tiers share
(algos.py), and ``run_cascade`` caches each level's matches because
exclusion depends on them.  The caller, not the operator, knows when
the results have been consumed, so the operators register every such
frame here and long-running sessions call :func:`unpersist_tracked`
between queries (the driver-query registry does this automatically —
each query clears the previous query's caches on entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["tracked_persist", "tracked_cache", "unpersist_tracked"]

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    out = df.persist()
    _TRACKED.append(out)
    return out


def tracked_cache(df: DataFrame) -> DataFrame:
    out = df.cache()
    _TRACKED.append(out)
    return out


def unpersist_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
