"""JVM Column expressions vs the Python parity layer on a randomized
corpus — the silent-drift guard for every place the engine evaluates
reference semantics JVM-side instead of via the Python functions."""

from __future__ import annotations

import random
import string

import pytest

from name_match_latest_spark.functions.normalize import normalize_simple
from name_match_latest_spark.functions.phonetics import soundex4_ascii
from name_match_latest_spark.functions.similarity import sim_levenshtein_pct


def _corpus(n=400, seed=7):
    rng = random.Random(seed)
    alphabet = string.ascii_letters + "  .--'éüßøñł"
    out = []
    for _ in range(n):
        ln = rng.randrange(0, 14)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    out += ["", " ", "...", "--", "Dr. John-Paul", "O'Brien", "Łukasz",
            "de la Cruz", "MÜLLER", "  padded  ", "a.b-c.d"]
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    c = _corpus()
    pairs = [(a, b) for a, b in zip(c, c[1:] + c[:1])]
    return c, pairs, spark.createDataFrame(pairs, "a string, b string")


def test_simple_col_matches_python(spark, corpus_df):
    from name_match_latest_spark.operators.persons import simple_col
    from pyspark.sql import functions as F

    c, pairs, df = corpus_df
    rows = df.select("a", simple_col(F.col("a")).alias("s")).collect()
    for r in rows:
        assert r.s == normalize_simple(r.a), repr(r.a)


def test_soundex4_col_matches_python(spark, corpus_df):
    from name_match_latest_spark.operators.persons import soundex4_col
    from pyspark.sql import functions as F

    c, pairs, df = corpus_df
    rows = df.select("a", soundex4_col(F.col("a")).alias("s")).collect()
    for r in rows:
        assert r.s == soundex4_ascii(r.a), repr(r.a)


def test_sim_lev_pct_col_matches_python(spark, corpus_df):
    from name_match_latest_spark.operators.scoring import sim_lev_pct_col
    from pyspark.sql import functions as F

    c, pairs, df = corpus_df
    rows = df.select(
        "a", "b", sim_lev_pct_col(F.col("a"), F.col("b")).alias("s")
    ).collect()
    for r in rows:
        assert r.s == pytest.approx(sim_levenshtein_pct(r.a, r.b), abs=1e-12), (r.a, r.b)


def test_middle_initials_col_matches_python(spark, corpus_df):
    from name_match_latest_spark.functions.normalize import middle_initials
    from name_match_latest_spark.operators.cascade import _middle_initials_col
    from pyspark.sql import functions as F

    c, pairs, df = corpus_df
    rows = df.select("a", _middle_initials_col(F.col("a")).alias("mi")).collect()
    for r in rows:
        assert r.mi == middle_initials(r.a), repr(r.a)


def test_full_middle_col_matches_python(spark, corpus_df):
    from name_match_latest_spark.functions.normalize import is_full_middle
    from name_match_latest_spark.operators.cascade import _full_middle_valid
    from pyspark.sql import functions as F

    c, pairs, df = corpus_df
    rows = df.select(
        "a", F.coalesce(_full_middle_valid(F.col("a")), F.lit(False)).alias("v")
    ).collect()
    for r in rows:
        assert r.v == is_full_middle(r.a), repr(r.a)
