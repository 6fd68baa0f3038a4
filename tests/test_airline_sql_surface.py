"""Both query surfaces (DataFrame API and Spark SQL) must produce the
same result for the reference analytics — same Catalyst plan family,
one semantic definition (SURVEY.md A6)."""

from __future__ import annotations

import pytest

from airline_data_pipeline_spark.pipeline.runner import build_flights
from airline_data_pipeline_spark.queries.airline import (
    AIRLINE_PERFORMANCE_SQL,
    airline_performance,
    airline_rollup,
)


@pytest.fixture(scope="module")
def flights(spark, tmp_path_factory, flights_fixture):
    path = str(tmp_path_factory.mktemp("sqlsurf") / "csv")
    flights_fixture.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return build_flights(spark, path).cache()


def test_sql_and_dataframe_surfaces_agree(spark, flights):
    flights.createOrReplaceTempView("flights_v")
    via_sql = spark.sql(AIRLINE_PERFORMANCE_SQL.format(table="flights_v")).collect()
    via_df = airline_performance(flights).collect()
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]


def test_rollup_grand_total_matches_sum_of_groups(flights):
    rows = {r["airline"]: r for r in airline_rollup(flights).collect()}
    total = rows.pop("__ALL__")
    assert total["total_flights"] == sum(r["total_flights"] for r in rows.values())
    assert total["delayed_flights"] == sum(r["delayed_flights"] for r in rows.values())
