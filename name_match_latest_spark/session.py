"""SparkSession factory with scale-appropriate defaults.

Single place where engine-level Spark configuration lives so local
tests, bench.py and spark-submit jobs share the same tuning:

* AQE on (runtime re-planning, skew-join splitting, partition
  coalescing) — replaces the reference's hand-rolled build-side
  selection (mod.rs:6405-6409) and adaptive batch sizing (:8070-8073).
* Arrow on for pandas UDFs with a bounded records-per-batch (the
  reference's streaming batch bounds analogue, mod.rs:6111-6118).
* shuffle partitions default sized for local[32]; on a real cluster
  pass ``shuffle_partitions≈2-3× total cores`` (or rely on AQE
  coalescing from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "name_match_latest_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # preallocate the heap: lazy heap growth during the first
        # cache/checkpoint materialization costs tens of seconds
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms" + os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
