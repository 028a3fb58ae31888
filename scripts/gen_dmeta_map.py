"""Generate fixtures/dmeta_map.parquet: simple-full-name -> Double
Metaphone code, for the DuckDB oracle of the full fuzzy cascade.

Double Metaphone is not SQL-expressible, but it IS a pure per-person
function of the name strings — so the oracle side-table materializes
``code = dmeta(simple_full)`` for every distinct full-name string the
driver-derived person tables (pa/pb from ``part``) can produce at any
test scale factor.  The oracle SQL joins this map by the STRING (which
it computes itself), so one committed fixture covers every sf whose
name vocabulary is included (TPC-H part names draw from a fixed ~92-
color vocabulary, so the distinct-string count stays small).

The Spark engine does NOT read this file — it computes dmeta with its
own pandas UDF (functions/phonetics.py); agreement of the two
independent paths is exactly what the correctness gate checks.

Usage:  python scripts/gen_dmeta_map.py [sf_dir ...]
Writes: fixtures/dmeta_map.parquet  (s: string, code: string)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from name_match_latest_spark.functions.normalize import (  # noqa: E402
    simple_full_name,
    simple_full_name_no_mid,
)
from name_match_latest_spark.functions.phonetics import (  # noqa: E402
    dmeta_code_from_simple,
)

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# the two person derivations from driver_queries.py, reduced to the
# name triple (first, middle, last)
TRIPLES_SQL = """
SELECT DISTINCT first_name, middle_name, last_name FROM (
  SELECT
    split_part(p_name, ' ', 1) AS first_name,
    CASE WHEN p_partkey % 4 = 0 THEN CAST(NULL AS VARCHAR)
         ELSE split_part(p_name, ' ', 2) END AS middle_name,
    split_part(p_name, ' ', 2) AS last_name
  FROM read_parquet('{sf}/part.parquet')
  UNION ALL
  SELECT
    CASE WHEN p_partkey % 5 = 0 THEN concat(split_part(p_name, ' ', 1), 'h')
         ELSE split_part(p_name, ' ', 1) END,
    CASE WHEN p_partkey % 3 = 0 THEN CAST(NULL AS VARCHAR)
         ELSE split_part(p_name, ' ', 2) END,
    split_part(p_name, ' ', 2)
  FROM read_parquet('{sf}/part.parquet')
)
"""


def main() -> None:
    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    con = duckdb.connect()
    triples: set[tuple[str | None, str | None, str | None]] = set()
    for sf in sf_dirs:
        rows = con.execute(TRIPLES_SQL.format(sf=sf)).fetchall()
        triples.update(rows)
        print(f"{sf}: {len(rows)} distinct name triples")

    mapping: dict[str, str] = {}
    for first, mid, last in triples:
        s_full = simple_full_name(first, mid, last)
        s_nomid = simple_full_name_no_mid(first, last)
        # the oracle computes the key with plain SQL concat; assert the
        # normalize_simple identity assumption holds for this corpus
        sql_full = f"{first or ''} {mid or ''} {last or ''}"
        sql_nomid = f"{first or ''} {last or ''}"
        assert s_full == sql_full, (s_full, sql_full)
        assert s_nomid == sql_nomid, (s_nomid, sql_nomid)
        mapping[s_full] = dmeta_code_from_simple(s_full)
        mapping[s_nomid] = dmeta_code_from_simple(s_nomid)

    keys = sorted(mapping)
    table = pa.table(
        {"s": keys, "code": [mapping[k] for k in keys]},
        schema=pa.schema([("s", pa.string()), ("code", pa.string())]),
    )
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "fixtures", "dmeta_map.parquet"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {len(keys)} entries -> {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
