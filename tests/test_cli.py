"""CLI entry point (`python -m name_match_latest_spark`): the
reference's `name_matcher <t1> <t2> <algo> <out>` surface over
parquet/CSV tables, with GPU flags accepted-and-ignored."""

from __future__ import annotations

import csv
import glob
import os
import subprocess
import sys

import pytest

from name_match_latest_spark.oracle import generate_persons


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    p1, p2 = generate_persons(40, seed=13)

    def dump(ps, name):
        from name_match_latest_spark.operators.persons import PERSON_SCHEMA

        rows = [
            (p.id, p.uuid, p.first_name, p.middle_name, p.last_name,
             p.birthdate, p.hh_id, p.barangay_code, p.city_code)
            for p in ps
        ]
        path = str(root / name)
        spark.createDataFrame(rows, PERSON_SCHEMA).write.parquet(path)
        return path

    return dump(p1, "t1"), dump(p2, "t2"), str(root)


def _run_cli(args):
    env = dict(os.environ, SPARK_GRAFT_MASTER="local[4]")
    res = subprocess.run(
        [sys.executable, "-m", "name_match_latest_spark", *args],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    return res


def _read_csv_rows(out_dir):
    rows = []
    for part in sorted(glob.glob(os.path.join(out_dir, "part-*.csv"))):
        with open(part) as f:
            rows.extend(csv.DictReader(f))
    return rows


def test_cli_algo1_end_to_end(tables):
    t1, t2, root = tables
    out = os.path.join(root, "out_a1")
    res = _run_cli([t1, t2, "1", out, "--threshold", "0.0"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "algo=1 matches=" in res.stdout
    rows = _read_csv_rows(out)
    assert len(rows) > 0
    assert {"t1_id", "t2_id", "confidence", "case_label"} <= set(rows[0])


def test_cli_fuzzy_with_gpu_flags_ignored(tables):
    t1, t2, root = tables
    out = os.path.join(root, "out_a3")
    res = _run_cli(
        [t1, t2, "3", out, "--threshold", "0.8",
         "--gpu-fuzzy-metrics", "--gpu-hash-join", "--allow-birthdate-swap"]
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "no effect" in res.stdout  # the ignored-flags note
    assert "algo=3 matches=" in res.stdout
    assert len(_read_csv_rows(out)) > 0


def test_cli_households_option5(tables):
    t1, t2, root = tables
    out = os.path.join(root, "out_h5")
    res = _run_cli([t1, t2, "5", out, "--threshold", "0.8"])
    assert res.returncode == 0, res.stderr[-2000:]
    rows = _read_csv_rows(out)
    assert rows and {"uuid", "hh_id", "match_percentage"} <= set(rows[0])


def test_cli_unknown_algo_errors(tables):
    t1, t2, root = tables
    res = _run_cli([t1, t2, "9", os.path.join(root, "out_bad")])
    assert res.returncode != 0


def test_cli_printed_count_equals_written_rows(tables):
    """The printed match count is the WRITTEN row count (round-3 fix:
    df.count() on the unpersisted result used to re-execute the whole
    match lineage a second time AND ignored the threshold filter)."""
    t1, t2, root = tables
    out = os.path.join(root, "out_cnt")
    res = _run_cli([t1, t2, "1", out, "--threshold", "0.0"])
    assert res.returncode == 0, res.stderr[-2000:]
    printed = int(res.stdout.split("matches=")[1].split()[0])
    assert printed == len(_read_csv_rows(out))


def test_cli_jdbc_arg_requires_table_param(tables):
    """A jdbc: table arg is routed (not fed to spark.read.parquet);
    missing ?table= is a clean argparse-style error."""
    t1, _, root = tables
    res = _run_cli(
        ["jdbc:mysql://example.invalid:3306/db", t1, "1", os.path.join(root, "out_j")]
    )
    assert res.returncode != 0
    assert "table=" in (res.stderr + res.stdout)


def test_cli_xlsx_format(tables):
    """--format xlsx writes a readable OOXML workbook (reference's
    default report format, xlsx_export.rs)."""
    import zipfile

    t1, t2, root = tables
    out = os.path.join(root, "out.xlsx")
    res = _run_cli([t1, t2, "1", out, "--format", "xlsx", "--threshold", "0.0"])
    assert res.returncode == 0, res.stderr[-2000:]
    printed = int(res.stdout.split("matches=")[1].split()[0])
    with zipfile.ZipFile(out) as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()
        body = z.read("xl/worksheets/sheet1.xml").decode()
    assert body.count("<row ") == printed + 1  # header + data rows


def test_cli_jdbc_url_parsing(monkeypatch):
    """URL splitter: table/user/password extracted, other params pass
    through to the JDBC driver untouched (no live MySQL in sandbox —
    the source call is captured, not executed)."""
    import name_match_latest_spark.cli as cli

    captured = {}

    def fake_read(spark, url, table, user, password, **kw):
        captured.update(url=url, table=table, user=user, password=password)
        return "DF"

    monkeypatch.setattr(
        "name_match_latest_spark.sources.jdbc.read_person_table_jdbc", fake_read
    )
    out = cli._load_jdbc(
        None, "jdbc:mysql://h:3306/db?table=persons&user=u&password=p&useSSL=false"
    )
    assert out == "DF"
    assert captured == {
        "url": "jdbc:mysql://h:3306/db?useSSL=false",
        "table": "persons",
        "user": "u",
        "password": "p",
    }


def test_cli_jdbc_passthrough_params_stay_verbatim(monkeypatch):
    """Percent-encoded values and repeated keys in non-extracted
    params must reach the driver UNTOUCHED (parse_qs would decode
    %3D into '=' and drop duplicates)."""
    import name_match_latest_spark.cli as cli

    captured = {}

    def fake_read(spark, url, table, user, password, **kw):
        captured.update(url=url)
        return "DF"

    monkeypatch.setattr(
        "name_match_latest_spark.sources.jdbc.read_person_table_jdbc", fake_read
    )
    cli._load_jdbc(
        None,
        "jdbc:mysql://h/db?sessionVariables=sql_mode%3DANSI&table=t"
        "&flag=a&flag=b",
    )
    assert captured["url"] == (
        "jdbc:mysql://h/db?sessionVariables=sql_mode%3DANSI&flag=a&flag=b"
    )
