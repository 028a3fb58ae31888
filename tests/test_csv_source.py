"""CSV loader parity: mapping inference, content-hash ids, encodings,
formula-injection guard (reference tests/csv_e2e.rs + csv_loader.rs)."""

from __future__ import annotations

import os

from name_match_latest_spark.sources.csv_source import infer_mapping


def _fnv_row_id(headers, values) -> int:
    h = 0xCBF29CE484222325

    def upd(bs):
        nonlocal h
        for b in bs:
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF

    for hdr, v in zip(headers, values):
        upd(hdr.encode())
        upd(b"=")
        if v is not None:
            upd(str(v).encode())
        upd(b"\x1f")
    return h & 0x7FFFFFFFFFFFFFFF


class TestMappingInference:
    def test_alias_headers(self):
        # tests/csv_e2e.rs:12-66 alias set
        m = infer_mapping(["person_id", "given_name", "surname", "dob", "extra"])
        assert m["id"] == "person_id"
        assert m["first_name"] == "given_name"
        assert m["last_name"] == "surname"
        assert m["birthdate"] == "dob"
        assert m["middle_name"] is None

    def test_exact_beats_substring(self):
        m = infer_mapping(["the_first_name_col", "first_name"])
        assert m["first_name"] == "first_name"

    def test_substring_fallback(self):
        m = infer_mapping(["My FirstName!", "LASTNAME (family)"])
        assert m["first_name"] == "My FirstName!"
        assert m["last_name"] == "LASTNAME (family)"


class TestLoad:
    def test_load_with_aliases_and_passthrough(self, spark, tmp_path):
        from name_match_latest_spark.sources.csv_source import load_persons_csv

        p = tmp_path / "a.csv"
        p.write_text(
            "person_id,given_name,surname,dob,region\n"
            "1,Ana,Cruz,1990-03-15,R1\n"
            "2,Jose,Santos,bad-date,R2\n"
        )
        df = load_persons_csv(spark, str(p))
        rows = {r.id: r for r in df.collect()}
        assert rows[1].first_name == "Ana"
        assert str(rows[1].birthdate) == "1990-03-15"
        assert rows[2].birthdate is None  # strict parse
        assert rows[1].region == "R1"  # extra-field passthrough

    def test_stable_content_hash_ids(self, spark, tmp_path):
        from name_match_latest_spark.sources.csv_source import load_persons_csv

        p = tmp_path / "noid.csv"
        p.write_text(
            "given_name,surname,dob\nAna,Cruz,1990-03-15\nJose,Santos,1985-01-02\n"
        )
        df = load_persons_csv(spark, str(p))
        got = sorted(r.id for r in df.collect())
        want = sorted(
            [
                _fnv_row_id(
                    ["given_name", "surname", "dob"], ["Ana", "Cruz", "1990-03-15"]
                ),
                _fnv_row_id(
                    ["given_name", "surname", "dob"], ["Jose", "Santos", "1985-01-02"]
                ),
            ]
        )
        assert got == want
        # stable across a second read
        assert sorted(r.id for r in load_persons_csv(spark, str(p)).collect()) == got

    def test_win1252_semicolon(self, spark, tmp_path):
        # tests/csv_e2e.rs:69-110
        from name_match_latest_spark.sources.csv_source import load_persons_csv

        p = tmp_path / "w.csv"
        content = "id;first_name;last_name;birthdate\n7;Jos\xe9;Garc\xeda;1970-05-06\n"
        p.write_bytes(content.encode("windows-1252"))
        df = load_persons_csv(spark, str(p), encoding="windows-1252", sep=";")
        r = df.collect()[0]
        assert r.first_name == "José"
        assert r.last_name == "García"

    def test_formula_injection_flag(self, spark, tmp_path):
        from name_match_latest_spark.sources.csv_source import load_persons_csv

        p = tmp_path / "inj.csv"
        p.write_text(
            "id,first_name,last_name,birthdate,note\n"
            "1,Ana,Cruz,1990-03-15,ok\n"
            '2,Jose,Santos,1985-01-02,"=cmd()"\n'
            "3,Juan,Reyes,1980-07-07,  +SUM(A1)\n"
        )
        df = load_persons_csv(spark, str(p))
        flags = {r.id: r.formula_injection_risk for r in df.collect()}
        assert flags == {1: False, 2: True, 3: True}
