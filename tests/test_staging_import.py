"""Staged import sink: dry-run validation, atomic swap, duplicate
policy, orphan GC (reference src/import/mod.rs:44-200,
src/import/staging.rs:24-792)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("uuid", StringType(), True),
        StructField("first_name", StringType(), True),
        StructField("last_name", StringType(), True),
        StructField("birthdate", DateType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _d(y, m, d):
    return datetime.date(y, m, d)


GOOD = [
    (1, "u1", "ana", "santos", _d(1990, 1, 2)),
    (2, "u2", "jose", "reyes", _d(1985, 3, 4)),
    (3, "u3", "maria", "cruz", _d(1978, 5, 6)),
]
BAD = [
    (0, "u4", "rosa", "garcia", _d(1990, 1, 2)),  # id <= 0
    (5, "u5", "  ", "ramos", _d(1991, 2, 3)),  # first_name blank
    (6, "u6", "luis", "torres", None),  # birthdate missing
]


def test_dry_run_reports_invalid_rows(spark):
    from name_match_latest_spark.sources.staging import ImportPolicy, dry_run

    report = dry_run(_df(spark, GOOD + BAD), ImportPolicy())
    assert report.total_rows == 6
    assert report.invalid_rows == 3
    assert report.valid_rows == 3
    # row numbers are file rows (header = 1): GOOD occupies 2-4
    assert [rn for rn, _ in report.invalid_samples] == [5, 6, 7]
    reasons = dict(report.invalid_samples)
    assert reasons[5] == "id must be greater than zero"
    assert reasons[6] == "first_name is required"
    assert reasons[7] == "birthdate is required"


def test_dry_run_duplicate_probe_and_warnings(spark):
    from name_match_latest_spark.sources.staging import ImportPolicy, dry_run

    dup_rows = GOOD + [(9, "u9", "ana", "santos", _d(1990, 1, 2))]
    p = ImportPolicy(duplicate_key="matcher_fields", mode="replace")
    report = dry_run(_df(spark, dup_rows), p)
    assert report.duplicate_rows == 1
    assert any("duplicate" in w for w in report.warnings)
    assert any("Replace mode" in w for w in report.warnings)


def test_commit_appends_atomically(spark, tmp_path):
    from name_match_latest_spark.sources.staging import ImportPolicy, staged_import
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    r1 = staged_import(spark, _df(spark, GOOD), t, job_id="job1")
    assert r1["status"] == "committed"
    assert t.read(spark).count() == 3

    more = [(10, "u10", "nora", "aquino", _d(1970, 7, 8))]
    r2 = staged_import(spark, _df(spark, more), t, job_id="job2")
    assert t.read(spark).count() == 4
    # old snapshot still pinned-readable (atomic swap, no in-place edit)
    assert t.read(spark, snapshot_id=r1["snapshot_id"]).count() == 3
    assert r2["snapshot_id"] != r1["snapshot_id"]


def test_validation_failure_leaves_table_untouched(spark, tmp_path):
    from name_match_latest_spark.sources.staging import ImportPolicy, staged_import
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    staged_import(spark, _df(spark, GOOD), t, job_id="job1")
    head = t.current_snapshot()

    r = staged_import(spark, _df(spark, BAD), t, job_id="job2")
    assert r["status"] == "validation_failed"
    assert r["report"].invalid_rows == 3
    assert t.current_snapshot() == head  # HEAD never flipped
    assert t.read(spark).count() == 3
    assert os.path.isdir(r["staging_dir"])  # stage kept for inspection


def test_duplicate_skip_policy(spark, tmp_path):
    from name_match_latest_spark.sources.staging import ImportPolicy, staged_import
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    staged_import(spark, _df(spark, GOOD), t, job_id="job1")

    # one input-dup pair (id 20 twice) + one key already in the table (id 1)
    rows = [
        (20, "x", "mila", "navarro", _d(1992, 2, 2)),
        (20, "y", "mila2", "navarro", _d(1992, 2, 2)),
        (1, "z", "ana2", "santos", _d(1990, 1, 2)),
    ]
    r = staged_import(
        spark,
        _df(spark, rows),
        t,
        job_id="job2",
        policy=ImportPolicy(duplicate_behavior="skip"),
    )
    assert r["status"] == "committed"
    out = {(row.id, row.uuid) for row in t.read(spark).collect()}
    assert (20, "x") in out  # first occurrence kept (file order)
    assert (20, "y") not in out
    assert (1, "z") not in out  # existing key skipped
    assert len(out) == 4


def test_replace_mode_swaps_table(spark, tmp_path):
    from name_match_latest_spark.sources.staging import ImportPolicy, staged_import
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    staged_import(spark, _df(spark, GOOD), t, job_id="job1")
    more = [(30, "u30", "pedro", "bautista", _d(1960, 9, 9))]
    staged_import(
        spark, _df(spark, more), t, job_id="job2", policy=ImportPolicy(mode="replace")
    )
    assert [r.id for r in t.read(spark).collect()] == [30]


def test_append_mode_never_rewrites_existing_files(spark, tmp_path):
    """Append-mode staged import must be an O(batch) manifest append:
    the new snapshot references ALL parent data files UNCHANGED and
    adds only the staged rows' files (round-3 fix: it used to
    union+commit, rewriting the whole table every import)."""
    from name_match_latest_spark.sources.staging import staged_import
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    r1 = staged_import(spark, _df(spark, GOOD), t, job_id="job1")
    parent_files = set(t._file_paths(r1["snapshot_id"]))
    parent_mtimes = {p: os.path.getmtime(p) for p in parent_files}

    more = [(10, "u10", "nora", "aquino", _d(1970, 7, 8))]
    r2 = staged_import(spark, _df(spark, more), t, job_id="job2")
    new_files = set(t._file_paths(r2["snapshot_id"]))
    # superset: every parent file is still referenced, byte-untouched
    assert parent_files < new_files
    assert all(os.path.getmtime(p) == parent_mtimes[p] for p in parent_files)
    # and only the staged rows landed in the new files
    added = sorted(new_files - parent_files)
    assert spark.read.parquet(*added).count() == 1
    assert t.read(spark).count() == 4


def test_duplicate_update_policy(spark, tmp_path):
    """duplicate_behavior='update': staged rows REPLACE existing rows
    with the same key; within the batch the LAST occurrence wins
    (INSERT .. ON DUPLICATE KEY UPDATE row order, staging.rs)."""
    from name_match_latest_spark.sources.staging import ImportPolicy, staged_import
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    staged_import(spark, _df(spark, GOOD), t, job_id="job1")

    rows = [
        (1, "z1", "ana-v2", "santos", _d(1990, 1, 2)),   # updates id 1
        (1, "z2", "ana-v3", "santos", _d(1990, 1, 2)),   # later row wins
        (40, "u40", "lea", "salonga", _d(1971, 2, 22)),  # new key
    ]
    r = staged_import(
        spark,
        _df(spark, rows),
        t,
        job_id="job2",
        policy=ImportPolicy(duplicate_behavior="update"),
    )
    assert r["status"] == "committed"
    out = {row.id: (row.uuid, row.first_name) for row in t.read(spark).collect()}
    assert len(out) == 4  # no duplicate keys committed
    assert out[1] == ("z2", "ana-v3")  # replaced, last occurrence
    assert out[2][0] == "u2" and out[3][0] == "u3"  # untouched rows survive
    assert out[40] == ("u40", "lea")


def test_orphan_stage_gc(spark, tmp_path):
    from name_match_latest_spark.sources.staging import (
        drop_orphan_stages,
        staged_import,
    )
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    r = staged_import(spark, _df(spark, BAD), t, job_id="aborted")  # fails validation
    assert r["status"] == "validation_failed"
    assert drop_orphan_stages(t) == 1
    assert drop_orphan_stages(t) == 0


def test_staging_dir_name_is_path_safe():
    from name_match_latest_spark.sources.staging import staging_dir_name

    assert staging_dir_name("job-12/..;rm").startswith("_nm_stage_job-12")
    assert "/" not in staging_dir_name("a/b/c")
    with pytest.raises(ValueError):
        staging_dir_name("///")


def test_update_policy_null_id_rows_not_dropped(spark, tmp_path):
    """A NULL duplicate key (duplicate_key='id' with a null id,
    reachable with allow_invalid=True) must still be imported:
    NULL never equals itself in the dedup joins, so an un-coalesced
    key silently dropped such rows."""
    from name_match_latest_spark.sources.staging import ImportPolicy, staged_import
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    staged_import(spark, _df(spark, GOOD), t, job_id="job1")

    rows = [
        (None, "zn", "nilo", "reyes", _d(1992, 7, 8)),  # null id
        (41, "u41", "lea", "salonga", _d(1971, 2, 22)),
    ]
    r = staged_import(
        spark,
        _df(spark, rows),
        t,
        job_id="job2",
        policy=ImportPolicy(duplicate_behavior="update"),
        allow_invalid=True,
    )
    assert r["status"] == "committed"
    out = t.read(spark)
    assert out.count() == 5
    assert out.filter(out.uuid == "zn").count() == 1

    # and 'skip' keeps exactly one row per (null) key rather than zero
    rows2 = [
        (None, "zm", "mira", "cruz", _d(1993, 8, 9)),
        (None, "zo", "otto", "cruz", _d(1994, 9, 10)),
    ]
    r2 = staged_import(
        spark,
        _df(spark, rows2),
        t,
        job_id="job3",
        policy=ImportPolicy(duplicate_behavior="skip"),
        allow_invalid=True,
    )
    assert r2["status"] == "committed"
    # both new null-id rows share the coalesced key with job2's null-id
    # row already in the table -> skip imports neither
    assert t.read(spark).count() == 5
