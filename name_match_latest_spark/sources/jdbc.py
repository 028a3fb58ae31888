"""JDBC (MySQL) person-table source.

The reference reads two MySQL tables with hand-rolled keyset pagination
(``SELECT ... WHERE id > ? AND id <= watermark ORDER BY id LIMIT n``,
db/schema.rs:966-1032).  Spark's JDBC source replaces that wholesale:
``partitionColumn/lowerBound/upperBound/numPartitions`` splits the scan
into parallel range queries — the same keyset ranges, planned by Spark,
executed concurrently, with predicate pushdown for filters.

Untestable in this sandbox (no MySQL); kept thin and obvious.  The
snapshot-stability trick (pin ``max(id)`` at start, mod.rs:6410-6413)
carries over as the ``upper_bound`` argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_person_table_jdbc"]


def read_person_table_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    id_column: str = "id",
    upper_bound: int | None = None,
    num_partitions: int = 64,
    fetch_size: int = 50_000,
) -> DataFrame:
    """Partitioned JDBC scan of a person table.

    ``upper_bound`` should be ``SELECT MAX(id)`` captured once at job
    start (watermark snapshot); rows inserted after it are excluded,
    giving the reference's scan stability.  ``fetch_size`` mirrors the
    reference's streaming batch default (mod.rs:6111-6118).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", str(fetch_size))
    )
    if upper_bound is not None:
        reader = (
            reader.option("partitionColumn", id_column)
            .option("lowerBound", "0")
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    df = reader.load()
    if upper_bound is not None:
        df = df.filter(f"{id_column} <= {upper_bound}")
    return df
