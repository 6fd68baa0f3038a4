"""Declared schemas for every source the engine reads.

The reference infers every dtype from CSV (`data_ingestion/ingest.py:73`,
`pd.read_csv(..., low_memory=False)`); at 100 TB inference means an extra
full scan and nondeterministic types, so the engine declares schemas and
allows sampling-bounded inference only for ad-hoc exploration
(SURVEY.md §1.2).

Airline schemas mirror the US DOT on-time performance layout the
reference consumes (`/root/reference/data/raw/flight_data.csv:1` header;
processed projection at `data_ingestion/ingest.py:314-324`; warehouse DDL
at `dags/flight_data_pipeline.py:82-95`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# flights_raw — the columns the reference touches out of the 90-column
# US DOT format. Numeric clock fields are HHMM-encoded (e.g. 1456.0);
# nullable doubles because cancelled flights have no actual times.
# Columns not listed here ride along via the permissive tail when the
# CSV is read with this schema as a subset (we project immediately, so
# unlisted columns are pruned at the scan).
# ---------------------------------------------------------------------------
FLIGHTS_RAW_CORE = T.StructType(
    [
        T.StructField("FL_DATE", T.StringType()),  # 'M/d/yyyy hh:mm:ss a'
        T.StructField("OP_CARRIER", T.StringType()),
        T.StructField("OP_CARRIER_FL_NUM", T.LongType()),
        T.StructField("TAIL_NUM", T.StringType()),
        T.StructField("ORIGIN", T.StringType()),
        T.StructField("ORIGIN_CITY_NAME", T.StringType()),
        T.StructField("DEST", T.StringType()),
        T.StructField("DEST_CITY_NAME", T.StringType()),
        T.StructField("CRS_DEP_TIME", T.LongType()),  # HHMM
        T.StructField("DEP_TIME", T.DoubleType()),  # HHMM, null if cancelled
        T.StructField("DEP_DELAY", T.DoubleType()),
        T.StructField("CRS_ARR_TIME", T.LongType()),
        T.StructField("ARR_TIME", T.DoubleType()),
        T.StructField("ARR_DELAY", T.DoubleType()),
        T.StructField("CANCELLED", T.DoubleType()),  # 0.0 / 1.0
        T.StructField("CANCELLATION_CODE", T.StringType()),
        T.StructField("DIVERTED", T.DoubleType()),
        T.StructField("AIR_TIME", T.DoubleType()),
        T.StructField("TAXI_OUT", T.DoubleType()),
        T.StructField("TAXI_IN", T.DoubleType()),
        T.StructField("DISTANCE", T.DoubleType()),
        T.StructField("CARRIER_DELAY", T.DoubleType()),
        T.StructField("WEATHER_DELAY", T.DoubleType()),
        T.StructField("NAS_DELAY", T.DoubleType()),
        T.StructField("SECURITY_DELAY", T.DoubleType()),
        T.StructField("LATE_AIRCRAFT_DELAY", T.DoubleType()),
    ]
)

# The 9-column projection+rename the ingestion stage produces
# (`data_ingestion/ingest.py:314-324` column_mapping).
PROCESSED_COLUMN_MAPPING: dict[str, str] = {
    "FL_DATE": "flight_date",
    "OP_CARRIER": "airline",
    "OP_CARRIER_FL_NUM": "flight_number",
    "ORIGIN": "origin",
    "DEST": "destination",
    "CRS_DEP_TIME": "scheduled_departure",
    "DEP_TIME": "actual_departure",
    "CRS_ARR_TIME": "scheduled_arrival",
    "ARR_TIME": "actual_arrival",
}

PROCESSED_FLIGHTS = T.StructType(
    [
        T.StructField("flight_date", T.StringType()),
        T.StructField("airline", T.StringType()),
        T.StructField("flight_number", T.LongType()),
        T.StructField("origin", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("scheduled_departure", T.LongType()),
        T.StructField("actual_departure", T.DoubleType()),
        T.StructField("scheduled_arrival", T.LongType()),
        T.StructField("actual_arrival", T.DoubleType()),
    ]
)

# final_flights = processed + derived delays + status
# (`data_processing/process.py:163-168`).
FINAL_FLIGHTS = T.StructType(
    list(PROCESSED_FLIGHTS.fields)
    + [
        T.StructField("departure_delay", T.DoubleType()),
        T.StructField("arrival_delay", T.DoubleType()),
        T.StructField("flight_status", T.StringType()),
    ]
)

# weather — struct with an array of station structs
# (`data_ingestion/ingest.py:145-150`, data/raw/weather_data.json).
WEATHER = T.StructType(
    [
        T.StructField(
            "stations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("temperature", T.LongType()),
                        T.StructField("conditions", T.StringType()),
                    ]
                )
            ),
        )
    ]
)

# ---------------------------------------------------------------------------
# Driver-generated testdata (TESTDATA.md / FIXTURES.md §A). Parquet
# carries its own schema; these are declared for validation (`expect`)
# and for streaming readers, which require explicit schemas.
# ---------------------------------------------------------------------------
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON map<string,int>
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
