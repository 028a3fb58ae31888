from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from name_match_latest_spark.session import get_spark

    s = get_spark("nm-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def persons_df(spark, persons):
    """list[oracle.Person] -> prepared Spark DataFrame."""
    from name_match_latest_spark.operators.persons import PERSON_SCHEMA, prepare_persons

    rows = [
        (
            p.id, p.uuid, p.first_name, p.middle_name, p.last_name,
            p.birthdate, p.hh_id, p.barangay_code, p.city_code,
        )
        for p in persons
    ]
    return prepare_persons(spark.createDataFrame(rows, PERSON_SCHEMA))
