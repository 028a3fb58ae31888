"""Arrow-batched pandas UDFs wrapping the parity-layer functions.

Only three things genuinely need Python at scale (everything else in
the engine is JVM Column expressions inside whole-stage codegen):

* ``normalize_text_udf`` — Unicode NFD + combining-mark stripping
  (per-PERSON, applied once per side before any join)
* ``dmeta_udf``          — Double Metaphone code (per-PERSON; pair
  scoring then compares codes JVM-side)
* ``jaro_winkler_udf``   — the single per-PAIR Python hotspot

All are SCALAR pandas UDFs: Spark ships Arrow record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``), so there is no
per-row Python dispatch at the Spark level (north-rule requirement).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from .normalize import normalize_text
from .phonetics import dmeta_code_from_simple
from .similarity import jaro_winkler

__all__ = ["normalize_text_udf", "dmeta_udf", "jaro_winkler_udf"]


@pandas_udf(StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: normalize_text(x) if x is not None else None)


@pandas_udf(StringType())
def dmeta_udf(simple: pd.Series) -> pd.Series:
    """Primary Double Metaphone code of a ``normalize_simple`` string
    ('' when the phonetic normalization is empty) — mod.rs:429-438."""
    # memoize within the batch: name columns are highly repetitive
    cache: dict[str, str] = {}

    def code(x: str | None) -> str:
        if x is None:
            return ""
        hit = cache.get(x)
        if hit is None:
            hit = cache[x] = dmeta_code_from_simple(x)
        return hit

    return s_map(simple, code)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """strsim-0.11 Jaro-Winkler over pair batches, with a per-batch
    memo (blocked candidate batches repeat the probe-side string)."""
    cache: dict[tuple[str, str], float] = {}
    out = []
    for x, y in zip(a, b):
        if x is None or y is None:
            out.append(0.0)
            continue
        key = (x, y)
        v = cache.get(key)
        if v is None:
            v = cache[key] = jaro_winkler(x, y)
        out.append(v)
    return pd.Series(out, dtype="float64")


def s_map(s: pd.Series, fn) -> pd.Series:
    return s.map(fn)
