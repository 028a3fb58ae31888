"""stream_sessionize == batch sessionize: the stateful streaming twin
must emit exactly the batch operator's sessions when events arrive in
event-time order across micro-batches (within a batch, any order).
A far-future sentinel event per user closes the trailing sessions
deterministically (the wall-clock-free alternative to
ProcessingTimeTimeout)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

SCHEMA = "user_id long, ts timestamp_ntz, value double"
SENTINEL = dt.datetime(2030, 1, 1)


def _mk(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _batches():
    # user 1: session A (2 events) split across batches, then a gap
    #         inside batch 2 opens session B
    # user 2: one session per batch (gap between batches)
    b1 = [
        (1, _mk(0), 1.0),
        (1, _mk(10, 30), 2.0),   # shuffled within-batch order is fine
        (2, _mk(5), 5.0),
    ]
    b2 = [
        (1, _mk(20), 3.0),       # 9.5 min after -> still session A
        (1, _mk(55), 4.0),       # 35 min gap -> session B
        (2, _mk(50), 6.0),       # 45 min gap -> session 2 for user 2
    ]
    b3 = [(1, SENTINEL, 0.0), (2, SENTINEL, 0.0)]  # close the tails
    return [b1, b2, b3]


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from name_match_latest_spark.operators.events import session_stats
    from name_match_latest_spark.streaming.sessionize import (
        stream_sessionize,
    )

    src = tmp_path / "events"
    src.mkdir()
    all_rows = []
    now = time.time()
    for i, rows in enumerate(_batches()):
        all_rows += rows
        d = src / f"b{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))
        # pin strictly increasing mtimes: the file source processes
        # oldest-first, and cross-batch event-time order is the
        # operator's documented contract
        import os

        for p in d.iterdir():
            os.utime(p, (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_sessionize(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_seq): (
            r.start_us,
            r.end_us,
            r.n_events,
            round(r.sum_value, 6),
        )
        for r in spark.sql("select * from stream_sessions").collect()
    }

    # batch truth over the SAME rows, sentinel sessions excluded
    batch = session_stats(
        spark.createDataFrame(all_rows, SCHEMA).withColumn(
            "event_id", F.monotonically_increasing_id()
        )
    )
    epoch = dt.datetime(1970, 1, 1)

    def us(ts):
        return int((ts - epoch).total_seconds() * 1_000_000)

    want = {
        (r.user_id, r.session_seq): (
            us(r.session_start),
            us(r.session_end),
            r.n_events,
            round(r.sum_value, 6),
        )
        for r in batch.collect()
        if r.session_start != SENTINEL
    }
    assert want, "batch truth must be non-empty"
    assert got == want  # user 1: sessions A+B; user 2: two sessions


def test_stream_sessionize_rejects_bad_timeout(spark):
    import pytest

    from name_match_latest_spark.streaming.sessionize import (
        stream_sessionize,
    )

    with pytest.raises(ValueError):
        stream_sessionize(spark.range(1), timeout="event")
