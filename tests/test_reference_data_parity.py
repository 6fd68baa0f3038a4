"""Parity on the reference's own committed data (SURVEY.md §5 #2).

Runs the engine's cleaning + analytics on the 2,000-row US DOT sample
committed in the reference repo and compares against an independent
pandas computation of the same semantics (delay = naive HHMM
difference, status threshold 15, per-airline conditional counts).
Skipped if the reference checkout is absent."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

REF_CSV = "/root/reference/data/raw/flight_data.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CSV), reason="reference data not available"
)


@pytest.fixture(scope="module")
def engine_flights(spark, tmp_path_factory):
    from airline_data_pipeline_spark.pipeline.runner import build_flights

    return build_flights(spark, REF_CSV).cache()


@pytest.fixture(scope="module")
def pandas_expected():
    df = pd.read_csv(REF_CSV, low_memory=False)
    out = pd.DataFrame(
        {
            "airline": df["OP_CARRIER"].str.upper(),
            "departure_delay": df["DEP_TIME"] - df["CRS_DEP_TIME"],
            "arrival_delay": df["ARR_TIME"] - df["CRS_ARR_TIME"],
        }
    )
    out["flight_status"] = "On Time"
    out.loc[out["departure_delay"] > 15, "flight_status"] = "Delayed"
    return out


def test_row_count_matches(engine_flights, pandas_expected):
    assert engine_flights.count() == len(pandas_expected)


def test_per_airline_metrics_match_pandas(engine_flights, pandas_expected):
    from airline_data_pipeline_spark.queries.airline import airline_performance

    got = {
        r["airline"]: r.asDict() for r in airline_performance(engine_flights).collect()
    }

    g = pandas_expected.groupby("airline")
    for airline, grp in g:
        e = got[airline]
        assert e["total_flights"] == len(grp)
        assert e["delayed_flights"] == int((grp["flight_status"] == "Delayed").sum())
        assert e["ontime_flights"] == int((grp["flight_status"] == "On Time").sum())
        # naive-HHMM average delay, rounded — pandas mean skips NaN like
        # Spark avg skips null
        exp_avg = grp["departure_delay"].mean()
        if math.isnan(exp_avg):
            assert e["avg_departure_delay"] is None
        else:
            assert abs(e["avg_departure_delay"] - exp_avg) < 0.01
        exp_pct = (grp["flight_status"] == "On Time").sum() / len(grp) * 100
        assert abs(e["ontime_percentage"] - exp_pct) < 0.01


def test_status_distribution_matches(engine_flights, pandas_expected):
    from pyspark.sql import functions as F

    got = {
        r["flight_status"]: r["n"]
        for r in engine_flights.groupBy("flight_status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exp = pandas_expected["flight_status"].value_counts().to_dict()
    assert got == exp
