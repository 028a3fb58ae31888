"""Pure-stdlib XLSX writer: match report + summary sheets.

Reference parity: `src/export/xlsx_export.rs:14-200` writes the match
results workbook (one sheet per algorithm + a Summary sheet) with
rust_xlsxwriter.  No XLSX library ships in this container, but XLSX is
just a ZIP of OOXML parts (ECMA-376, public spec) — this module writes
the minimal conformant subset directly with ``zipfile`` + string
templates: inline strings (no sharedStrings part), one bold header
style, ISO strings for dates.

Scale note: XLSX is inherently a DRIVER-SIDE report format (the
reference also writes one local file).  ``write_matches_xlsx`` caps
collected rows at ``max_rows`` (default 100k, hard OOXML sheet limit
1,048,576) and says so in the summary — the full result belongs in the
parquet/CSV sinks; the workbook is the human report.
"""

from __future__ import annotations

import datetime
import zipfile
from typing import Iterable, Sequence

__all__ = ["write_xlsx", "write_matches_xlsx", "XLSX_MAX_ROWS"]

#: OOXML hard per-sheet row limit
XLSX_MAX_ROWS = 1_048_576

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
{sheet_overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
<Relationship Id="rIdS" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

# two fills (none + gray125) are required by strict readers; style 1 =
# bold header (xlsx_export.rs header_format twin)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font><font><b/><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="2"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="2"><xf/><xf fontId="1" applyFont="1"/></cellXfs>
</styleSheet>"""


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value, style: int = 0) -> str:
    s = f' s="{style}"' if style else ""
    if value is None:
        return f'<c r="{ref}"{s}/>'
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
        return f'<c r="{ref}"{s}/>'  # NaN/inf: <v>nan</v> is invalid OOXML
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
    if isinstance(value, (datetime.date, datetime.datetime)):
        value = value.isoformat(sep=" ") if isinstance(value, datetime.datetime) else value.isoformat()
    return f'<c r="{ref}"{s} t="inlineStr"><is><t xml:space="preserve">{_esc(str(value))}</t></is></c>'


def _sheet_xml(header: Sequence[str], rows: Iterable[Sequence]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        "<sheetData>",
    ]
    hdr = "".join(
        _cell_xml(f"{_col_letter(c)}1", h, style=1) for c, h in enumerate(header)
    )
    parts.append(f'<row r="1">{hdr}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(path: str, sheets: dict[str, tuple[Sequence[str], Iterable[Sequence]]]) -> None:
    """Write an .xlsx workbook.  ``sheets``: ordered mapping of sheet
    name -> (header row, data row iterable).  Bold header row; inline
    strings; numbers typed; None -> empty cell."""
    if not sheets:
        raise ValueError("at least one sheet required")
    names = list(sheets)
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        f'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    sheet_tags = "".join(
        f'<sheet name="{_esc(n[:31])}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    rels = "\n".join(
        f'<Relationship Id="rId{i + 1}" '
        f'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(names))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(sheets=sheet_tags))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS.format(rels=rels))
        z.writestr("xl/styles.xml", _STYLES)
        for i, name in enumerate(names):
            header, rows = sheets[name]
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(header, rows))


def write_matches_xlsx(
    matches,
    path: str,
    summary=None,
    sheet_name: str = "Matches",
    max_rows: int = 100_000,
) -> dict:
    """The reference's match-results workbook (xlsx_export.rs:14-200):
    one sheet of match rows + a Summary sheet.

    ``matches`` / ``summary`` are DataFrames; rows are collected
    driver-side (XLSX is a single local file by nature) with a
    ``max_rows`` cap — the capped count is reported on the Summary
    sheet so a truncated report is never mistaken for a full one.
    Returns {"rows_written": n, "truncated": bool, "total_rows": N}
    where ``total_rows`` is the REAL match count: when the cap hits,
    one extra count() pass is paid so callers never report the cap
    as the result (a 2M-pair run must not print "matches=100000").
    """
    max_rows = min(max_rows, XLSX_MAX_ROWS - 1)
    cols = matches.columns
    collected = matches.limit(max_rows + 1).collect()
    truncated = len(collected) > max_rows
    total_rows = matches.count() if truncated else len(collected)
    rows = [tuple(r[c] for c in cols) for r in collected[:max_rows]]

    sheets: dict[str, tuple[Sequence[str], Iterable[Sequence]]] = {
        sheet_name: (cols, rows)
    }
    summary_rows: list[tuple] = []
    if summary is not None:
        sdata = summary.collect()
        for r in sdata:
            for c in summary.columns:
                summary_rows.append((c, r[c]))
    summary_rows.append(("rows_in_sheet", len(rows)))
    summary_rows.append(("total_matches", total_rows))
    summary_rows.append(("truncated_at_cap", truncated))
    sheets["Summary"] = (("metric", "value"), summary_rows)
    write_xlsx(path, sheets)
    return {
        "rows_written": len(rows),
        "truncated": truncated,
        "total_rows": total_rows,
    }
