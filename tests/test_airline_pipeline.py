"""Reference-parity tests for the airline pipeline (SURVEY.md §5 #2).

Runs the full staged pipeline on a deterministic fixture and asserts
the semantics the reference implements: projection/rename, delay
derivation (naive HHMM), flight_status thresholds, metric shapes, and
the weather enrichment join the reference only declares.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airline_data_pipeline_spark.pipeline.runner import build_flights, run_pipeline


@pytest.fixture(scope="module")
def raw_csv(spark, tmp_path_factory, flights_fixture):
    path = str(tmp_path_factory.mktemp("raw") / "flight_data_csv")
    flights_fixture.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return path


@pytest.fixture(scope="module")
def weather_json(tmp_path_factory):
    p = tmp_path_factory.mktemp("weather") / "weather_data.json"
    p.write_text(
        json.dumps(
            {
                "stations": [
                    {"id": "JFK", "temperature": 72, "conditions": "clear"},
                    {"id": "LAX", "temperature": 85, "conditions": "sunny"},
                    {"id": "ZZZ", "temperature": 0, "conditions": "unmatched"},
                ]
            }
        )
    )
    return str(p)


def test_build_flights_schema_and_rename(spark, raw_csv):
    flights = build_flights(spark, raw_csv)
    assert set(flights.columns) == {
        "flight_date", "airline", "flight_number", "origin", "destination",
        "scheduled_departure", "actual_departure", "scheduled_arrival",
        "actual_arrival", "departure_delay", "arrival_delay", "flight_status",
    }


def test_delay_is_naive_hhmm_subtraction(spark, raw_csv):
    """Parity with process.py:163-164: delay = raw HHMM difference."""
    row = (
        build_flights(spark, raw_csv)
        .filter(F.col("actual_departure").isNotNull())
        .select("scheduled_departure", "actual_departure", "departure_delay")
        .first()
    )
    assert row["departure_delay"] == row["actual_departure"] - row["scheduled_departure"]


def test_flight_status_threshold(spark, raw_csv):
    flights = build_flights(spark, raw_csv)
    bad = flights.filter(
        ((F.col("departure_delay") > 15) & (F.col("flight_status") != "Delayed"))
        | (
            (F.col("departure_delay") <= 15) & (F.col("flight_status") != "On Time")
        )
        # null delay (cancelled) → On Time, matching the reference's
        # pandas semantics (NaN > 15 is False → no 'Delayed' assignment)
        | (F.col("departure_delay").isNull() & (F.col("flight_status") != "On Time"))
    )
    assert bad.count() == 0


def test_pipeline_end_to_end(spark, raw_csv, weather_json, tmp_path):
    out = str(tmp_path / "warehouse")
    result = run_pipeline(spark, raw_csv, out, weather_json_path=weather_json)

    assert result.validation_failures == []
    warehouse = spark.read.parquet(result.flights_path)
    assert warehouse.count() == 400
    # weather enrichment: JFK/LAX rows carry temperature, others null
    assert warehouse.filter(
        (F.col("origin") == "JFK") & F.col("temperature").isNull()
    ).count() == 0
    assert warehouse.filter(F.col("origin") == "ORD").filter(
        F.col("temperature").isNotNull()
    ).count() == 0

    # metric shape parity (flight_metrics.json structure,
    # dags/flight_data_pipeline.py:168-174)
    m = result.metrics
    assert m["total_flights"] == 400
    assert set(m["airlines"][0]) == {
        "airline", "total_flights", "avg_departure_delay", "avg_arrival_delay",
        "delayed_flights", "ontime_flights", "ontime_percentage",
    }
    # per-airline counts sum to total; rates within [0, 100]
    assert sum(a["total_flights"] for a in m["airlines"]) == 400
    for a in m["airlines"]:
        assert 0 <= a["ontime_percentage"] <= 100
        assert a["delayed_flights"] + a["ontime_flights"] == a["total_flights"]

    # artifacts exist (reference's outputs: flight_metrics.json etc.)
    for name in ("flight_metrics.json", "route_analysis.json", "api_metrics.json"):
        assert os.path.exists(os.path.join(out, "processed", name))

    # uppercase normalization applied (fixture has 'wn', 'sfo')
    assert warehouse.filter(F.col("airline") == "wn").count() == 0
    assert warehouse.filter(F.col("airline") == "WN").count() > 0

    # Observation-API stage telemetry rode the warehouse write (no
    # extra job): row count, key-null counters, weather-match counter
    obs = result.observations
    assert obs["n_rows"] == 400
    assert obs["null_airline"] == 0 and obs["null_origin"] == 0
    assert obs["weather_matched"] == warehouse.filter(
        F.col("temperature").isNotNull()
    ).count()
    assert 0 < obs["weather_matched"] < 400  # fixture: some match, not all


def test_partition_pruning_layout(spark, raw_csv, tmp_path):
    """The warehouse is flight_date-partitioned: a date filter must
    read only that partition's directory (P4 partition-prunability)."""
    out = str(tmp_path / "wh2")
    result = run_pipeline(spark, raw_csv, out)
    subdirs = [d for d in os.listdir(result.flights_path) if d.startswith("flight_date=")]
    assert len(subdirs) == 3  # fixture has 3 distinct dates
    one_day = spark.read.parquet(result.flights_path).filter(
        F.col("flight_date") == "2024-01-01"
    )
    # partition filter yields exactly the fixture's day-1 rows
    assert one_day.count() == 134
