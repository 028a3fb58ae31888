"""Hashed-feature linear scorer vs a pure-Python replica; exactness
with integer-valued weights; partitioning bit-invariance."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np

from name_match_latest_spark.operators.inference import (
    hashed_linear_score,
    md5_fixed_weights,
    token_bucket,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "spam spam spam"),
    (2, ""),
    (3, None),
    (4, "Mixed CASE tokens mixed case"),
]


def py_score(text, w, seed):
    toks = [t for t in text.lower().split() if t] if isinstance(text, str) else []
    if not toks:
        return (0, 0.0, 0.0)
    s = 0.0
    for tok, c in Counter(toks).items():
        s += c * w[token_bucket(tok, seed, len(w))]
    return (len(toks), s, s / len(toks))


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestTokenBucket:
    def test_md5_convention(self):
        # same convention as sampling.hash_bucket32: md5('tok:seed')[:8]
        h = int(hashlib.md5(b"cat:s1").hexdigest()[:8], 16)
        assert token_bucket("cat", "s1", 100) == h % 100

    def test_fixed_weights_range_and_determinism(self):
        w = md5_fixed_weights(256, "ws")
        assert w.shape == (256,) and w.dtype == np.float64
        assert ((w >= -1000) & (w <= 1000)).all()
        assert (w == w.astype(np.int64)).all()  # integer-valued
        assert (w == md5_fixed_weights(256, "ws")).all()
        assert (w != md5_fixed_weights(256, "other")).any()


class TestHashedLinearScore:
    def test_matches_python_replica_bitexact(self, spark):
        w = md5_fixed_weights(64, "tw")
        got = {
            r.doc_id: (r.n_tokens, r.score, r.norm_score)
            for r in hashed_linear_score(_df(spark), w, seed="ts").collect()
        }
        assert set(got) == {d for d, _ in DOCS}
        for doc_id, text in DOCS:
            assert got[doc_id] == py_score(text, w, "ts"), doc_id

    def test_partitioning_bit_invariant(self, spark):
        w = md5_fixed_weights(64, "tw")
        a = sorted(map(tuple, hashed_linear_score(_df(spark), w).collect()))
        b = sorted(
            map(
                tuple,
                hashed_linear_score(_df(spark).repartition(5), w).collect(),
            )
        )
        assert a == b

    def test_float_weights_deterministic(self, spark):
        rng = np.random.default_rng(7)
        w = rng.normal(size=128)
        a = sorted(map(tuple, hashed_linear_score(_df(spark), w).collect()))
        b = sorted(map(tuple, hashed_linear_score(_df(spark), w).collect()))
        assert a == b

    def test_empty_weights_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError):
            hashed_linear_score(_df(spark), np.array([]))
