"""curatecli end-to-end: filter -> sample -> split -> decontam over
the sf0.001 documents, outputs consistent with the operators."""

from __future__ import annotations

import hashlib
import json

import pytest

B32 = 1 << 32


def _run(capsys, argv):
    from name_match_latest_spark.curatecli import run

    rc = run(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


@pytest.fixture(scope="module")
def docs_path():
    return "/root/testdata/sf0.001/documents.parquet"


def test_end_to_end(spark, tmp_path, capsys, docs_path):
    out = str(tmp_path / "o")
    s = _run(
        capsys,
        [docs_path, out, "--sample", "en=1.0,de=1.0", "--default-rate", "0.5",
         "--seed", "t1"],
    )
    assert s["n_input"] == 500
    assert 0 < s["n_kept"] <= 500
    assert sum(s["splits"].values()) == s["n_kept"]
    assert "decontam" in s and s["decontam"]["n_test_docs"] >= 0

    kept = spark.read.parquet(out + "/corpus")
    # replay the sampling + split decisions in pure python
    for r in kept.select("doc_id", "lang", "split").collect():
        b = int(hashlib.md5(f"{r.doc_id}:t1".encode()).hexdigest()[:8], 16)
        rate = 1.0 if r.lang in ("en", "de") else 0.5
        assert b < round(rate * B32)
        t1, t2 = round(0.8 * B32), round(0.9 * B32)
        want = "train" if b < t1 else "val" if b < t2 else "test"
        assert r.split == want


def test_min_tokens_filter(spark, tmp_path, capsys, docs_path):
    out = str(tmp_path / "o2")
    s_all = _run(capsys, [docs_path, str(tmp_path / "oa"), "--no-decontam"])
    s_min = _run(capsys, [docs_path, out, "--min-tokens", "40", "--no-decontam"])
    assert s_min["n_kept"] < s_all["n_kept"]
    kept = spark.read.parquet(out + "/corpus")
    import pyspark.sql.functions as F

    n_tok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    assert kept.where(n_tok < 40).count() == 0


def test_rerun_is_deterministic(spark, tmp_path, capsys, docs_path):
    a = _run(capsys, [docs_path, str(tmp_path / "a"), "--sample", "en=0.6",
                      "--default-rate", "0.3", "--no-decontam"])
    b = _run(capsys, [docs_path, str(tmp_path / "b"), "--sample", "en=0.6",
                      "--default-rate", "0.3", "--no-decontam"])
    assert a["splits"] == b["splits"] and a["n_kept"] == b["n_kept"]
    ka = {r.doc_id: r.split for r in spark.read.parquet(str(tmp_path / "a") + "/corpus").collect()}
    kb = {r.doc_id: r.split for r in spark.read.parquet(str(tmp_path / "b") + "/corpus").collect()}
    assert ka == kb


def test_repetition_gate_flags(spark, tmp_path, capsys, docs_path):
    """--max-dup-frac/--max-bigram-frac route through
    repetition_quality_gate; the kept set equals the operator's."""
    from name_match_latest_spark.operators.repetition import (
        repetition_quality_gate,
    )

    out = str(tmp_path / "og")
    s = _run(
        capsys,
        [docs_path, out, "--min-tokens", "20", "--max-dup-frac", "0.55",
         "--max-bigram-frac", "0.12", "--no-decontam"],
    )
    expect = {
        r.doc_id
        for r in repetition_quality_gate(
            spark.read.parquet(docs_path),
            min_tokens=20,
            max_dup_token_frac=0.55,
            max_top_bigram_frac=0.12,
        ).collect()
    }
    kept = {
        r.doc_id
        for r in spark.read.parquet(out + "/corpus").select("doc_id").collect()
    }
    assert kept == expect
    assert s["n_kept"] == len(expect) < 500


def test_dup_frac_alone_keeps_token_floor_off(spark, tmp_path, capsys, docs_path):
    """--max-dup-frac without --min-tokens must not silently impose a
    length floor (min_tokens defaults to 0 -> only the dup rule)."""
    out = str(tmp_path / "od")
    s = _run(capsys, [docs_path, out, "--max-dup-frac", "1.0", "--no-decontam"])
    assert s["n_kept"] == 500  # dup frac <= 1.0 always; no floor applied


def test_temperature_budget_flag(spark, tmp_path, capsys, docs_path):
    """--temperature-budget routes through temperature_sample; kept
    set equals the operator's, and it upweights rare languages."""
    from name_match_latest_spark.operators.sampling import temperature_sample

    out = str(tmp_path / "ot")
    s = _run(capsys, [docs_path, out, "--temperature-budget", "0.5",
                      "--seed", "t9", "--no-decontam"])
    expect = {
        r.doc_id
        for r in temperature_sample(
            spark.read.parquet(docs_path), 0.5, seed="t9"
        ).collect()
    }
    kept = {
        r.doc_id
        for r in spark.read.parquet(out + "/corpus").select("doc_id").collect()
    }
    assert kept == expect and 0 < s["n_kept"] < 500


def test_sample_and_temperature_mutually_exclusive(spark, docs_path, tmp_path):
    import pytest

    from name_match_latest_spark.curatecli import run

    with pytest.raises(SystemExit):
        run([docs_path, str(tmp_path / "x"), "--sample", "en=0.5",
             "--temperature-budget", "0.5"])
