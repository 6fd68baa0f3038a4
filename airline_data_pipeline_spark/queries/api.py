"""The reference's HTTP API query surface as engine functions
(SURVEY.md §3.3; `api/app.py`).

The Flask app re-reads the whole CSV per request (`api/app.py:121`),
filters, paginates with a reset_index cursor, and aggregates. Here the
query surface is a set of functions over a *cached registered table* —
the serving layer (HTTP, auth, rate limits) stays out of engine scope,
but every data semantic of the three endpoints is reproduced:

- /api/flights  → `flights_page`   (P4 P5 P6 O1 O2 O5)
- /api/metrics  → `metrics_summary` (A1 A2 A3 A5)
- /api/airports → `airports_list`  (A10)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airline_data_pipeline_spark.functions.numeric import round_half_up
from airline_data_pipeline_spark.operators.pagination import encode_cursor, keyset_page
from airline_data_pipeline_spark.operators.topk import grouped_count_top_k

PAGE_KEYS = ["flight_date", "flight_number", "origin"]


def apply_flight_filters(
    flights: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
    airline: str | None = None,
    origin: str | None = None,
    destination: str | None = None,
) -> DataFrame:
    """The /api/flights filter chain (`api/app.py:137-144`).

    Airport/airline codes are normalized to uppercase before the
    equality predicate, matching the reference's `.upper()` calls.
    Date-range predicates prune partitions when the table is
    date-partitioned (§4).
    """
    out = flights
    if start_date:
        out = out.filter(F.col("flight_date") >= F.lit(start_date))
    if end_date:
        out = out.filter(F.col("flight_date") <= F.lit(end_date))
    if airline:
        out = out.filter(F.col("airline") == airline.upper())
    if origin:
        out = out.filter(F.col("origin") == origin.upper())
    if destination:
        out = out.filter(F.col("destination") == destination.upper())
    return out


def flights_page(
    flights: DataFrame,
    limit: int = 100,
    cursor: str | None = None,
    **filters,
) -> dict:
    """One page of flights + next_cursor (`api/app.py:60-181`).

    Distributed keyset pagination on the natural key
    (flight_date, flight_number, origin) — no global row ids, no
    re-scan-from-zero per page (SURVEY §7.3.5). Returns the reference's
    response shape: {flights, next_cursor, count}.
    """
    filtered = apply_flight_filters(flights, **filters)
    page_df, _key = keyset_page(filtered, PAGE_KEYS, limit=limit, cursor=cursor)
    rows = page_df.collect()
    next_cursor = None
    if len(rows) == min(limit, 1000):
        last = rows[-1]
        next_cursor = encode_cursor(*[last[k] for k in PAGE_KEYS])
    return {
        "flights": [r.asDict() for r in rows],
        "next_cursor": next_cursor,
        "count": len(rows),
    }


def metrics_summary(flights: DataFrame, **filters) -> dict:
    """/api/metrics (`api/app.py:183-289`): totals, rates, top routes,
    top carriers, date range, delay stats — TWO jobs total (one global
    aggregate pass + one grouped top-k pass), not one job per metric.
    """
    filtered = apply_flight_filters(flights, **filters).withColumn(
        "__delayed",
        F.coalesce(
            (F.col("departure_delay") > 15) | (F.col("arrival_delay") > 15),
            F.lit(False),
        ),
    )
    g = filtered.agg(
        F.count(F.lit(1)).alias("total_flights"),
        round_half_up(F.avg(F.col("__delayed").cast("double")) * 100, 2).alias(
            "delay_rate"
        ),
        round_half_up(F.avg("departure_delay"), 2).alias("avg_departure_delay"),
        round_half_up(F.avg("arrival_delay"), 2).alias("avg_arrival_delay"),
        F.max("departure_delay").alias("max_departure_delay"),
        F.max("arrival_delay").alias("max_arrival_delay"),
        F.min("flight_date").alias("min_date"),
        F.max("flight_date").alias("max_date"),
    ).first()

    top_routes = grouped_count_top_k(filtered, ["origin", "destination"], 5).collect()
    top_carriers = grouped_count_top_k(filtered, ["airline"], 5).collect()

    return {
        "total_flights": g["total_flights"],
        "delay_rate": g["delay_rate"],
        "avg_departure_delay": g["avg_departure_delay"],
        "avg_arrival_delay": g["avg_arrival_delay"],
        "max_departure_delay": g["max_departure_delay"],
        "max_arrival_delay": g["max_arrival_delay"],
        "date_range": {"start": str(g["min_date"]), "end": str(g["max_date"])},
        "top_routes": [r.asDict() for r in top_routes],
        "top_carriers": [r.asDict() for r in top_carriers],
    }


def airports_list(flights: DataFrame) -> list[str]:
    """/api/airports (`api/app.py:291-332`): distinct origins ∪
    destinations, sorted (op A10)."""
    out = (
        flights.select(F.col("origin").alias("airport"))
        .union(flights.select(F.col("destination").alias("airport")))
        .distinct()
        .orderBy("airport")
    )
    return [r["airport"] for r in out.collect()]
