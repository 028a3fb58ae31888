"""Pure-stdlib XLSX writer (reference xlsx_export.rs twin): the
workbook must be a valid OOXML zip whose sheets round-trip the data.
No XLSX reader lib exists in this container either, so assertions
parse the OOXML parts directly (zipfile + ElementTree)."""

from __future__ import annotations

import datetime
import zipfile
import xml.etree.ElementTree as ET

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _sheet_cells(path, sheet_idx):
    with zipfile.ZipFile(path) as z:
        xml = z.read(f"xl/worksheets/sheet{sheet_idx}.xml")
    root = ET.fromstring(xml)
    out = {}
    for c in root.iter("{%s}c" % NS["m"]):
        ref = c.attrib["r"]
        t = c.attrib.get("t")
        if t == "inlineStr":
            out[ref] = c.findtext("m:is/m:t", namespaces=NS)
        else:
            v = c.findtext("m:v", namespaces=NS)
            out[ref] = v
    return out


def test_write_xlsx_roundtrip(tmp_path):
    from name_match_latest_spark.sources.xlsx import write_xlsx

    p = str(tmp_path / "report.xlsx")
    write_xlsx(
        p,
        {
            "Data": (
                ["name", "score", "born", "note"],
                [
                    ("ana & co <x>", 0.95, datetime.date(1990, 1, 2), None),
                    ("jose", 42, datetime.date(1985, 3, 4), 'say "hi"'),
                ],
            ),
            "Summary": (("metric", "value"), [("n", 2)]),
        },
    )
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml", "xl/styles.xml",
                "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"} <= names
        # every XML part must parse
        for n in names:
            if n.endswith(".xml") or n.endswith(".rels"):
                ET.fromstring(z.read(n))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheet_names = [s.attrib["name"] for s in wb.iter("{%s}sheet" % NS["m"])]
        assert sheet_names == ["Data", "Summary"]

    cells = _sheet_cells(p, 1)
    assert cells["A1"] == "name" and cells["B1"] == "score"
    assert cells["A2"] == "ana & co <x>"  # XML-escaped and back
    assert cells["B2"] == "0.95"
    assert cells["C2"] == "1990-01-02"
    assert cells["D3"] == 'say "hi"'
    assert _sheet_cells(p, 2)["B2"] == "2"


def test_column_letters():
    from name_match_latest_spark.sources.xlsx import _col_letter

    assert [_col_letter(i) for i in (0, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_write_matches_xlsx(spark, tmp_path):
    from name_match_latest_spark.sources.sinks import run_summary
    from name_match_latest_spark.sources.xlsx import write_matches_xlsx

    import time

    matches = spark.createDataFrame(
        [(1, 101, 0.97, "CASE 1"), (2, 102, 1.0, "DIRECT MATCH")],
        "t1_id long, t2_id long, confidence double, case_label string",
    )
    summary = run_summary(spark, 10, 12, matches, time.time(), "algo3")
    p = str(tmp_path / "matches.xlsx")
    res = write_matches_xlsx(matches, p, summary=summary)
    assert res == {"rows_written": 2, "truncated": False, "total_rows": 2}

    cells = _sheet_cells(p, 1)
    assert cells["D1"] == "case_label"
    assert {cells["D2"], cells["D3"]} == {"CASE 1", "DIRECT MATCH"}
    s = _sheet_cells(p, 2)
    pairs = {}
    r = 2
    while f"A{r}" in s:
        pairs[s[f"A{r}"]] = s[f"B{r}"]
        r += 1
    assert pairs["algorithm"] == "algo3"
    assert pairs["n_matches"] == "2"
    assert pairs["rows_in_sheet"] == "2"


def test_truncation_cap_reported(spark, tmp_path):
    from name_match_latest_spark.sources.xlsx import write_matches_xlsx

    df = spark.range(50).selectExpr("id AS t1_id", "id AS t2_id")
    p = str(tmp_path / "cap.xlsx")
    res = write_matches_xlsx(df, p, max_rows=10)
    assert res["rows_written"] == 10 and res["truncated"] is True
    assert res["total_rows"] == 50  # the REAL count, not the cap
    s = _sheet_cells(p, 2)
    vals = {s[f"A{r}"]: s[f"B{r}"] for r in (2, 3, 4)}
    assert vals["rows_in_sheet"] == "10"
    assert vals["total_matches"] == "50"
    assert vals["truncated_at_cap"] == "1"


def test_nan_inf_cells_are_empty(tmp_path):
    """float NaN/inf must emit an EMPTY cell: <v>nan</v> is invalid
    OOXML and breaks Excel/openpyxl parsing."""
    from name_match_latest_spark.sources.xlsx import write_xlsx

    p = str(tmp_path / "nan.xlsx")
    write_xlsx(
        p,
        {
            "S": (
                ("a", "b", "c", "d"),
                [(float("nan"), float("inf"), float("-inf"), 1.5)],
            )
        },
    )
    import zipfile

    xml = zipfile.ZipFile(p).read("xl/worksheets/sheet1.xml").decode()
    assert "nan" not in xml and "inf" not in xml
    cells = _sheet_cells(p, 1)
    assert cells.get("A2") is None and cells.get("D2") == "1.5"
