"""Driver-local tiny DataFrames as JVM LocalTableScans.

`spark.createDataFrame(list_of_tuples, schema)` parallelizes the rows
into a PYTHON-evaluated RDD with defaultParallelism (32) slices — a
16-row centroid table becomes a 32-partition Python scan, and a
`.coalesce(1).write` then evaluates those 32 Python workers
SEQUENTIALLY in one task. Measured r10 (session with worker-reuse
pinned): writing a 16-row, 64-dim centroid table cost 3.8-5.5 s per
call; the same rows routed through a pandas DataFrame arrive as an
Arrow batch and plan as a pure-JVM `LocalTableScan`, writing in
0.14-0.16 s warm (~30× — it was the dominant cost of the stored-IVF
index build, 10.3 s of which was two tiny meta/centroid writes).

Use `local_df` for every model-sized artifact the engine materializes
from driver memory (index meta tables, centroids, candidate lists).
Not for rows already containing Spark-only types the pandas bridge
would coerce (pre-collected `Row`s with timestamps keep the plain
path — see `queries/suite.py::_localized`).

At 100 TB nothing changes semantically: these frames are O(model),
never O(data); the point is that the fixed per-write cost stays
milliseconds so per-batch/per-trigger index refreshes don't pay a
multi-second Python-worker tax.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """A small driver-side row list as an Arrow-backed LocalTableScan.

    `schema` is a DDL string ("cell int, vec array<double>"); column
    order in each tuple must match it, exactly as with
    `spark.createDataFrame`. Empty row lists are valid (schema-only).

    SESSION DEPENDENCY (ADVICE r10): the LocalTableScan guarantee rides
    on `spark.sql.execution.arrow.pyspark.enabled` — with Arrow off,
    the pandas bridge falls back to the exact 32-slice Python-RDD path
    this helper exists to avoid, silently. `session.get_spark` pins the
    conf; any other session is checked here and rejected loudly (the
    check is a driver-local conf read, no Spark job).
    """
    if (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "true")
        .lower() != "true"
    ):
        raise RuntimeError(
            "local_df requires spark.sql.execution.arrow.pyspark.enabled="
            "true (else the pandas bridge degrades to the 32-slice "
            "Python-RDD path, ~30x slower per tiny write); build the "
            "session with airline_data_pipeline_spark.session.get_spark "
            "or set the conf explicitly"
        )
    names = [c.split(None, 1)[0] for c in _split_top_level(schema)]
    pdf = pd.DataFrame(rows, columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema)


def _split_top_level(schema: str) -> list[str]:
    """Split a DDL column list on commas not nested in <> or ()."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out
