"""Snapshot-manifest tables: atomic commit, snapshot pinning."""

from __future__ import annotations


def test_commit_and_pin(spark, tmp_path):
    from name_match_latest_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    assert t.current_snapshot() is None

    s1 = t.commit(spark.range(5))
    assert t.current_snapshot() == s1
    assert t.read(spark).count() == 5

    s2 = t.commit(spark.range(8))
    assert t.current_snapshot() == s2
    # HEAD sees the new version; the pinned reader still sees snapshot 1
    assert t.read(spark).count() == 8
    assert t.read(spark, snapshot_id=s1).count() == 5

    snaps = t.snapshots()
    assert [s["snapshot_id"] for s in snaps] == sorted([s1, s2])
    assert next(s for s in snaps if s["snapshot_id"] == s2)["parent"] == s1
