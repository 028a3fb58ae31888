"""Hashed-feature linear scoring — the model-inference plumbing a
quality-classifier filter needs at corpus scale (the CCNet /
RefinedWeb-style fastText quality gate: score every document with a
linear model over hashed token counts, keep docs above a threshold).

The ACTUAL trained weights are an external input (training happens
off-corpus); what the engine provides is the scale-correct inference
path:

- the weight vector rides an explicit ``SparkContext.broadcast`` (one
  copy per executor, not per task — a 2M-bucket float64 model is
  16 MB, broadcast territory, never a join),
- scoring is ONE Arrow-batched ``mapInPandas`` scan (per-doc token
  Counter -> numpy dot against the broadcast vector), zero shuffles,
- the token->bucket hash is md5-based (``sampling.hash_bucket32``'s
  convention), so feature identity is engine-portable and stable
  forever — a score computed today replays bit-identically in any
  engine, which is what makes filter decisions auditable,
- token->bucket lookups are memoized per worker process with a
  bounded cache (vocabulary repeats heavily within a partition).

Exactness: with INTEGER-VALUED weights (``md5_fixed_weights``, or any
quantized model) every product and partial sum is an integer below
2^53, so float64 accumulation is EXACT regardless of order — the
score hash-matches a DuckDB twin with zero tolerance, same trick as
the fixed-point PageRank/centroid operators.  With arbitrary float
weights the per-doc score is still deterministic (fixed per-doc
accumulation order), just not a cross-engine bit contract.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

__all__ = ["hashed_linear_score", "md5_fixed_weights", "token_bucket"]

#: per-process token->bucket memo cap (vocabulary cache, not a leak)
_MEMO_MAX = 1 << 20
_BUCKET_MEMO: dict[tuple[str, int], dict[str, int]] = {}


def token_bucket(tok: str, seed: str, n_buckets: int) -> int:
    """md5(tok ':' seed) first-8-hex as int, mod n_buckets — the
    feature-hash contract (identical to ``sampling.hash_bucket32``
    followed by the modulus)."""
    h = int(hashlib.md5(f"{tok}:{seed}".encode()).hexdigest()[:8], 16)
    return h % n_buckets


def md5_fixed_weights(n_buckets: int, seed: str, lo: int = -1000, hi: int = 1000):
    """Deterministic INTEGER-VALUED weight vector derived from md5 —
    the replayable stand-in for a trained quality model (and the
    weight generator the DuckDB oracle twin re-derives in SQL):
    ``w[b] = lo + md5_32(b ':' seed) % (hi - lo + 1)``."""
    import numpy as np

    span = hi - lo + 1
    return np.array(
        [
            lo + int(hashlib.md5(f"{b}:{seed}".encode()).hexdigest()[:8], 16) % span
            for b in range(n_buckets)
        ],
        dtype=np.float64,
    )


def hashed_linear_score(
    docs: DataFrame,
    weights,
    seed: str = "hl",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_tokens, score, norm_score)`` — linear model over
    hashed token counts: ``score = sum_t count(t) * W[bucket(t)]``,
    ``norm_score = score / n_tokens`` (0.0 for empty docs; every doc
    gets a row).  ``weights`` is a 1-D numpy array; its length is the
    bucket count."""
    import numpy as np
    import pandas as pd
    from collections import Counter

    from .repetition import _tokens

    w = np.ascontiguousarray(np.asarray(weights, dtype=np.float64))
    n_buckets = len(w)
    if n_buckets == 0:
        raise ValueError("weights must be a non-empty 1-D vector")
    bc = docs.sparkSession.sparkContext.broadcast(w)

    def score(batches):
        wv = bc.value
        # bound the OUTER dict too: a long-lived executor scoring with
        # many (seed, n_buckets) models would otherwise grow one inner
        # memo per model without limit (round-5 advice)
        if (seed, n_buckets) not in _BUCKET_MEMO and len(_BUCKET_MEMO) >= 8:
            _BUCKET_MEMO.clear()
        memo = _BUCKET_MEMO.setdefault((seed, n_buckets), {})
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = _tokens(text)
                n = len(toks)
                if n == 0:
                    rows.append((did, 0, 0.0, 0.0))
                    continue
                s = 0.0
                for tok, c in Counter(toks).items():
                    b = memo.get(tok)
                    if b is None:
                        b = token_bucket(tok, seed, n_buckets)
                        if len(memo) < _MEMO_MAX:
                            memo[tok] = b
                    s += c * wv[b]
                rows.append((did, n, s, s / n))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_tokens", "score", "norm_score"]
            )

    id_type = dict(docs.dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        score,
        schema=(
            f"{id_col} {id_type}, n_tokens long,"
            " score double, norm_score double"
        ),
    )
