"""Excel source: minimal OOXML written in-test, serial-date semantics."""

from __future__ import annotations

import zipfile
from datetime import date

from name_match_latest_spark.sources.excel_source import (
    excel_serial_to_date,
    load_persons_xlsx,
    read_xlsx_rows,
)

_CT = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="People" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_WB_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_SST = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
<si><t>person_id</t></si><si><t>given_name</t></si><si><t>surname</t></si>
<si><t>dob</t></si><si><t>Ana</t></si><si><t>Cruz</t></si>
</sst>"""

# row 2: Ana Cruz with dob as STRING (inline); row 3: serial date 33000
_SHEET = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
<c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
</row>
<row r="2">
<c r="A2"><v>7</v></c><c r="B2" t="s"><v>4</v></c>
<c r="C2" t="s"><v>5</v></c>
<c r="D2" t="inlineStr"><is><t>1990-03-15</t></is></c>
</row>
<row r="3">
<c r="A3"><v>8</v></c>
<c r="B3" t="inlineStr"><is><t>Jose</t></is></c>
<c r="C3" t="inlineStr"><is><t>Santos</t></is></c>
<c r="D3"><v>33000</v></c>
</row>
</sheetData></worksheet>"""


def _write_xlsx(path):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SST)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET)


def test_serial_dates():
    # 1900 system incl. the Lotus bug: 1 -> 1900-01-01, 60 -> 1900-02-29
    # (phantom) mapped like calamine to 1900-02-28; 61 -> 1900-03-01
    assert excel_serial_to_date(1) == date(1900, 1, 1)
    assert excel_serial_to_date(59) == date(1900, 2, 28)
    assert excel_serial_to_date(61) == date(1900, 3, 1)
    assert excel_serial_to_date(60) == date(1900, 2, 28)  # phantom day
    assert excel_serial_to_date(33000) == date(1990, 5, 7)
    assert excel_serial_to_date(0) is None


def test_read_rows(tmp_path):
    p = tmp_path / "t.xlsx"
    _write_xlsx(str(p))
    headers, rows = read_xlsx_rows(str(p))
    assert headers == ["person_id", "given_name", "surname", "dob"]
    assert rows[0] == ["7", "Ana", "Cruz", "1990-03-15"]
    assert rows[1] == ["8", "Jose", "Santos", "33000"]


def test_load_persons_xlsx(spark, tmp_path):
    p = tmp_path / "t.xlsx"
    _write_xlsx(str(p))
    df = load_persons_xlsx(spark, str(p))
    got = {r.id: (r.first_name, r.last_name, r.birthdate) for r in df.collect()}
    assert got[7] == ("Ana", "Cruz", date(1990, 3, 15))
    assert got[8] == ("Jose", "Santos", date(1990, 5, 7))  # serial 33000
