"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (A6 per-group performance
metrics shape) on sf0.001. `queries()` exposes every implemented
operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
`oracle_sql()` gives the DuckDB-equivalent ANSI SQL for each
SQL-expressible one. All three delegate to the engine package —
this file is wiring only.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from airline_data_pipeline_spark.queries.suite import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the A6 performance-metrics query on sf0.001."""
    q = registry()["perf_metrics"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2)."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; omitted for non-SQL-expressible
    ops (LSH candidate generation, heuristic scoring) → rows-only check."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
