from __future__ import annotations


def test_apply_column_mapping(spark):
    from name_match_latest_spark.operators.persons import (
        apply_column_mapping,
        prepare_persons,
    )

    df = spark.createDataFrame(
        [(1, "Ana", "Cruz", "1990-03-15", "x")],
        "pid long, given string, family string, dob string, extra string",
    )
    from pyspark.sql import functions as F

    mapped = apply_column_mapping(
        df.withColumn("dob", F.to_date("dob")),
        {"id": "pid", "first_name": "given", "last_name": "family", "birthdate": "dob"},
    )
    assert "middle_name" in mapped.columns  # filled with NULL
    assert "extra" in mapped.columns  # passthrough
    prepared = prepare_persons(mapped)
    row = prepared.collect()[0]
    assert row.first_n == "ana"
    assert row.sx_last_n == "C620"
