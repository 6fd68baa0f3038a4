"""IO layer: schema'd sources and sinks (SURVEY.md §2.1, ops S1-S8)."""

from airline_data_pipeline_spark.io.readers import (
    load_testdata,
    read_flights_csv,
    read_weather_json,
    table,
)
from airline_data_pipeline_spark.io.writers import (
    write_csv_export,
    write_jdbc,
    write_parquet,
)

__all__ = [
    "load_testdata",
    "read_flights_csv",
    "read_weather_json",
    "table",
    "write_csv_export",
    "write_jdbc",
    "write_parquet",
]
