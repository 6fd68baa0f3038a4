"""Oracle-differential tests (SURVEY.md §5 strategy #1): every
SQL-expressible suite query must match DuckDB on the same parquet.
This is a local replica of the driver's sf0.01 gate, run at sf0.001
for speed (set ORACLE_SF_DIR to override)."""

from __future__ import annotations

import os

import pytest

from airline_data_pipeline_spark.queries.suite import registry
from tests.oracle_harness import compare, duckdb_connection

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_SQL_QUERIES = [(name, q) for name, q in registry().items() if q.oracle is not None]
_ROWS_ONLY = [(name, q) for name, q in registry().items() if q.oracle is None]

# Queries allowed to return 0 rows at small SF, each with a reason.
# Everything else MUST be non-empty — a 0=0 oracle match is vacuous
# (it proves agreement on emptiness, not operator correctness; see
# VERDICT r6 "What's wrong" #1/#2).
MAY_BE_EMPTY: dict[str, str] = {}


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name,qdef", _SQL_QUERIES, ids=[n for n, _ in _SQL_QUERIES])
def test_oracle_match(spark, con, name, qdef):
    df = qdef.fn(spark, SF_DIR)
    ok, msg = compare(df, con, qdef.oracle, allow_empty=name in MAY_BE_EMPTY)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name,qdef", _ROWS_ONLY, ids=[n for n, _ in _ROWS_ONLY])
def test_rows_only_runs(spark, name, qdef):
    df = qdef.fn(spark, SF_DIR)
    n = df.count()
    assert len(df.columns) > 0
    # same vacuity discipline as the oracle side: a rows-only query
    # that returns nothing verified nothing
    assert name in MAY_BE_EMPTY or n > 0, (
        f"{name}: rows-only query returned 0 rows at {SF_DIR} — retune "
        "or add to MAY_BE_EMPTY with a justification"
    )


def test_checked_window_is_exactly_50_unique_registry_names():
    """The driver's correctness gate runs the FIRST 50 of registry() —
    the hand-rotated _CHECKED_WINDOW. A 51-entry window would silently
    push row 51 out of the driver's check; a duplicate would both waste
    a slot and shift every later row. Pin the invariants."""
    from airline_data_pipeline_spark.queries.suite import _CHECKED_WINDOW, registry

    assert len(_CHECKED_WINDOW) == 50, len(_CHECKED_WINDOW)
    assert len(set(_CHECKED_WINDOW)) == 50, "duplicate window entries"
    names = set(registry())
    missing = [n for n in _CHECKED_WINDOW if n not in names]
    assert not missing, missing
    # and the window really is the head of the registry iteration order
    assert list(registry())[:50] == list(_CHECKED_WINDOW)
