"""Job control (run_service/mod.rs:128-289 twin): cancel via Spark job
groups, cooperative pause, statusTracker progress."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F


def test_cancel_kills_running_job_group(spark):
    from name_match_latest_spark.plans.jobs import JobRegistry

    reg = JobRegistry()
    errors = []

    def long_job():
        h = reg.start(spark, "job-cancel", "slow count")
        try:
            # ~30s+ of work if not cancelled
            spark.range(0, 1 << 33, 1, 8).select(
                F.avg(F.xxhash64(F.sha2(F.col("id").cast("string"), 256)))
            ).collect()
        except Exception as e:  # Py4J wraps the SparkException
            errors.append(str(e))
        finally:
            h.close()

    t = threading.Thread(target=long_job)
    t.start()
    time.sleep(3)  # let stages start
    reg.get("job-cancel").cancel()
    t.join(timeout=30)
    assert not t.is_alive(), "cancelJobGroup did not stop the job"
    assert errors and "cancel" in errors[0].lower()
    assert reg.get("job-cancel").progress()["state"] == "cancelled"


def test_pause_resume_checkpoint_between_units(spark):
    from name_match_latest_spark.plans.jobs import JobRegistry

    reg = JobRegistry()
    h = reg.start(spark, "job-pause", "chunked")
    done_units = []

    def worker():
        for i in range(3):
            h.checkpoint()  # blocks while paused
            spark.range(100).count()
            done_units.append(i)

    h.request_pause()
    t = threading.Thread(target=worker)
    t.start()
    time.sleep(1.0)
    assert done_units == []  # paused before the first unit
    assert h.progress()["state"] == "paused"
    h.request_resume()
    t.join(timeout=60)
    assert done_units == [0, 1, 2]
    h.close()


def test_cancel_unblocks_paused_job(spark):
    from name_match_latest_spark.plans.jobs import JobHandle

    h = JobHandle(spark, "job-pc", "")
    h.request_pause()

    hit = []

    def worker():
        try:
            h.checkpoint()
        except InterruptedError:
            hit.append(True)

    t = threading.Thread(target=worker)
    t.start()
    time.sleep(0.5)
    h.cancel()
    t.join(timeout=10)
    assert hit == [True]
    h.close()


def test_progress_shape(spark):
    from name_match_latest_spark.plans.jobs import JobRegistry

    reg = JobRegistry()
    h = reg.start(spark, "job-prog", "")
    p = h.progress()
    assert p["job_id"] == "job-prog"
    assert p["state"] == "running"
    assert p["elapsed_sec"] >= 0
    assert reg.list() and reg.list()[0]["job_id"] == "job-prog"
    reg.remove("job-prog")
    assert reg.get("job-prog") is None
    h.close()
