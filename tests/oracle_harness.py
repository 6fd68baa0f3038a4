"""Local replica of the driver's correctness gate.

Runs each `queries()` entry through Spark and its `oracle_sql()` twin
through DuckDB over the same parquet, then compares row count, column
names, and order-insensitive values (columns sorted by name, rows
sorted, floats rounded) — mismatches here predict CORRECTNESS_r{N}
failures before the driver sees them.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (int, str)):
        return v
    return str(v)


def _normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con, sql: str, *, allow_empty: bool = False) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    if not s_rows and not allow_empty:
        # A 0=0 match proves only that both engines agree on emptiness —
        # it exercises none of the operators the query was written to
        # verify. Queries that may legitimately be empty at small SF
        # must opt in via allow_empty (MAY_BE_EMPTY allowlist in
        # tests/test_oracle_parity.py).
        return False, (
            "vacuous: both sides returned 0 rows — retune the query's "
            "filters so the result is non-empty at this SF, or add it "
            "to MAY_BE_EMPTY with a justification"
        )
    sn = _normalize(s_cols, s_rows)
    dn = _normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
