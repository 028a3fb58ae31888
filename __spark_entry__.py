"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full blocked fuzzy match (Algo 3)
over person tables derived deterministically from sf0.001 testdata.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2 (see name_match_latest_spark/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: normalize -> block ->
    score cascade -> match pairs, deterministically ordered."""
    from name_match_latest_spark.driver_queries import load_persons
    from name_match_latest_spark.operators.algos import match_fuzzy, sort_matches

    t1, t2 = load_persons(spark, "/root/testdata/sf0.001")
    out = match_fuzzy(t1, t2, allow_swap=True)
    return sort_matches(out).select(
        "t1_id", "t2_id", "confidence", "case_label", "matched_fields"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from name_match_latest_spark.driver_queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from name_match_latest_spark.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
