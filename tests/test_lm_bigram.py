"""Bigram-LM NLL scoring vs a pure-Python replica; OOV handling with
a separate train corpus; partitioning bit-invariance."""

from __future__ import annotations

import math
from collections import Counter

from name_match_latest_spark.operators.textstats import (
    LN_FX_SCALE,
    lm_bigram_nll,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat"),
    (2, "a b a b a"),
    (3, ""),  # no tokens
    (4, "single"),  # one token: no bigrams
]


def _bigrams(text):
    toks = [t for t in text.lower().split() if t] if isinstance(text, str) else []
    return list(zip(toks, toks[1:]))


def py_lm(docs, train=None):
    train = docs if train is None else train
    cab = Counter(bg for _, t in train for bg in _bigrams(t))
    ca = Counter(bg[0] for _, t in train for bg in _bigrams(t))

    def lq(c):
        return math.floor(math.log(c) * LN_FX_SCALE)

    out = {}
    for did, t in docs:
        bgs = _bigrams(t)
        n_oov = sum(1 for bg in bgs if bg not in cab)
        nll_fx = sum(lq(ca[bg[0]]) - lq(cab[bg]) for bg in bgs if bg in cab)
        n_scored = len(bgs) - n_oov
        nll = nll_fx / (n_scored * LN_FX_SCALE) if n_scored > 0 else 0.0
        out[did] = (len(bgs), n_oov, nll_fx, nll)
    return out


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLmBigramNll:
    def test_self_scoring_matches_replica(self, spark):
        got = {
            r.doc_id: (r.n_bigrams, r.n_oov, r.nll_fx, r.nll)
            for r in lm_bigram_nll(_df(spark)).collect()
        }
        assert set(got) == {d for d, _ in DOCS}  # every doc gets a row
        assert got == py_lm(DOCS)
        assert got[3] == (0, 0, 0, 0.0) and got[4] == (0, 0, 0, 0.0)
        # doc 2's 'a b' repeats: certain transitions score low nll
        assert got[2][3] < got[0][3]

    def test_oov_against_separate_train(self, spark):
        train = [(10, "the cat sat on the mat")]
        score = [(0, "the cat sat"), (1, "zz qq zz")]  # doc 1 fully OOV
        got = {
            r.doc_id: (r.n_bigrams, r.n_oov, r.nll_fx, r.nll)
            for r in lm_bigram_nll(
                _df(spark, score), train=_df(spark, train)
            ).collect()
        }
        assert got == py_lm(score, train)
        assert got[1][1] == got[1][0] == 2  # both bigrams OOV
        assert got[1][3] == 0.0

    def test_partitioning_bit_invariant(self, spark):
        rows = [(i, f"tok{i % 7} tok{(i + 1) % 5} tok{i % 3} tok{i % 7}")
                for i in range(60)]
        a = sorted(map(tuple, lm_bigram_nll(_df(spark, rows)).collect()))
        b = sorted(
            map(
                tuple,
                lm_bigram_nll(_df(spark, rows).repartition(9)).collect(),
            )
        )
        assert a == b
