"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count,
column names and order-insensitive values.  Usage:

    python scripts/check_oracles.py [--hash] [sf_dir] [query ...]

``--hash`` compares EXACT value strings (repr for floats — bitwise),
matching the driver's hash gate instead of the default 1e-9 rounding;
use it to catch float-determinism divergence the rounded compare
masks (the round-5 events_sessionize class).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

EXACT = "--hash" in sys.argv
if EXACT:
    sys.argv.remove("--hash")


def normalize_rows(cols, rows):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = repr(v) if EXACT else round(v, 9)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from name_match_latest_spark.driver_queries import TABLES
    from name_match_latest_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_arrow_table().to_pylist()
            dcols = list(ddf[0].keys()) if ddf else [d[0] for d in con.execute(oracles[name]).description]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"cols {scols} vs {dcols}"))
            print(f"FAIL  {name}: column mismatch {scols} vs {dcols}")
            continue
        if len(srows) != len(ddf):
            failures.append((name, f"rowcount {len(srows)} vs {len(ddf)}"))
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(ddf)}")
            continue
        sn = normalize_rows(sorted(scols), srows)
        dn = normalize_rows(sorted(scols), ddf)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ ({len([1 for a,b in zip(sn,dn) if a!=b])} rows), e.g.")
            for a, b in diff:
                print(f"   spark: {a}\n   duck : {b}")
            continue
        print(f"OK    {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
