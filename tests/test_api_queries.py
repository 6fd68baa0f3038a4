"""API query-surface tests (SURVEY.md §3.3): pagination completeness
(no row skipped or duplicated across pages — the P6 property test),
filter semantics, metric summary shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airline_data_pipeline_spark.pipeline.runner import build_flights
from airline_data_pipeline_spark.queries.api import (
    airports_list,
    flights_page,
    metrics_summary,
)


@pytest.fixture(scope="module")
def flights(spark, tmp_path_factory, flights_fixture):
    path = str(tmp_path_factory.mktemp("api_raw") / "csv")
    flights_fixture.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return build_flights(spark, path).cache()


def test_pagination_no_skip_no_dup(flights):
    """Walk every page; the union of pages must equal the full dataset
    exactly (SURVEY §5 property #4)."""
    seen: list[tuple] = []
    cursor = None
    for _ in range(100):  # bound the loop
        page = flights_page(flights, limit=37, cursor=cursor)
        seen.extend(
            (r["flight_date"], r["flight_number"], r["origin"]) for r in page["flights"]
        )
        cursor = page["next_cursor"]
        if cursor is None or page["count"] < 37:
            break
    assert len(seen) == 400
    assert len(set(seen)) == 400  # no duplicates


def test_pagination_is_ordered(flights):
    page = flights_page(flights, limit=50)
    keys = [
        (str(r["flight_date"]), r["flight_number"], r["origin"])
        for r in page["flights"]
    ]
    assert keys == sorted(keys)


def test_filters_normalize_case(flights):
    page = flights_page(flights, limit=1000, origin="jfk")
    assert page["count"] > 0
    assert all(r["origin"] == "JFK" for r in page["flights"])


def test_date_range_filter(flights):
    page = flights_page(
        flights, limit=1000, start_date="2024-01-02", end_date="2024-01-02"
    )
    assert page["count"] == 133  # fixture day-2 rows
    assert all(str(r["flight_date"]) == "2024-01-02" for r in page["flights"])


def test_limit_cap(flights):
    page = flights_page(flights, limit=100_000)
    assert page["count"] <= 1000  # api/app.py:131 cap


def test_metrics_summary_shape(flights):
    m = metrics_summary(flights)
    assert m["total_flights"] == 400
    assert 0 <= m["delay_rate"] <= 100
    assert len(m["top_routes"]) == 5
    assert len(m["top_carriers"]) == 4  # fixture has 4 carriers
    assert m["date_range"]["start"] == "2024-01-01"
    assert m["date_range"]["end"] == "2024-01-03"


def test_airports_union_distinct(flights):
    airports = airports_list(flights)
    assert airports == sorted(set(airports))
    assert set(airports) == {"JFK", "LAX", "ORD", "SFO", "ATL"}
