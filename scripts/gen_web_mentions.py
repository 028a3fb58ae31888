"""Generate fixtures for the web_cluster_pages DuckDB oracle.

The pipeline's INPUT pages are produced by a Python generator
(sources/web.py) that DuckDB cannot replay, so the oracle starts one
stage downstream: the extracted mention rows, persisted once as a
parquet fixture.  Extraction itself stays covered by its byte-exact
pytest fixtures (tests/fixtures/), and the correctness gate then
hash-verifies everything AFTER extraction — blocking, candidate join,
the scoring cascade, and transitive clustering — because the live
Spark query re-runs real extraction from the generated pages and must
land on exactly these rows.

Two outputs:
* fixtures/web_mentions.parquet — (id, url, mention_idx, first_name,
  last_name, birthdate, lang, domain): the mentions_as_persons output
  for the canonical 2000-page seed-42 crawl.  Derived keys (soundex,
  simple full names) are NOT stored; the oracle recomputes them in SQL.
* fixtures/web_dmeta_map.parquet — (s, code): Double Metaphone codes
  keyed by the simple no-middle full-name STRING (same side-table
  pattern as fixtures/dmeta_map.parquet; dmeta is a pure function of
  the name string but not SQL-expressible).

Usage:  python scripts/gen_web_mentions.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_PAGES = 2000
SEED = 42
PARTITIONS = 8


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from name_match_latest_spark.functions.normalize import simple_full_name_no_mid
    from name_match_latest_spark.functions.phonetics import dmeta_code_from_simple
    from name_match_latest_spark.session import get_spark
    from name_match_latest_spark.sources.web import (
        extract_mentions,
        generate_webpages,
        mentions_as_persons,
    )

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    out_dir = os.path.join(repo, "fixtures")

    spark = get_spark("gen-web-mentions", master="local[8]", shuffle_partitions=8)
    pages = generate_webpages(spark, N_PAGES, seed=SEED, partitions=PARTITIONS)
    mentions = mentions_as_persons(extract_mentions(pages.drop("html")))
    rows = (
        mentions.select(
            "id", "url", "mention_idx", "first_name", "last_name",
            "birthdate", "lang", "domain",
        )
        .orderBy("id")
        .collect()
    )
    table = pa.table(
        {
            "id": pa.array([r.id for r in rows], pa.int64()),
            "url": pa.array([r.url for r in rows]),
            "mention_idx": pa.array([r.mention_idx for r in rows], pa.int32()),
            "first_name": pa.array([r.first_name for r in rows]),
            "last_name": pa.array([r.last_name for r in rows]),
            "birthdate": pa.array([r.birthdate for r in rows]),
            "lang": pa.array([r.lang for r in rows]),
            "domain": pa.array([r.domain for r in rows]),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "web_mentions.parquet"))
    print(f"web_mentions.parquet: {table.num_rows} mentions")

    names = sorted({(r.first_name, r.last_name) for r in rows})
    mapping = {}
    for first, last in names:
        s = simple_full_name_no_mid(first, last)
        mapping[s] = dmeta_code_from_simple(s)
    dm = pa.table(
        {"s": pa.array(sorted(mapping)), "code": pa.array([mapping[s] for s in sorted(mapping)])}
    )
    pq.write_table(dm, os.path.join(out_dir, "web_dmeta_map.parquet"))
    print(f"web_dmeta_map.parquet: {dm.num_rows} name strings")
    spark.stop()


if __name__ == "__main__":
    main()
