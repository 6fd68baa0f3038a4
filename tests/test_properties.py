"""Property-based tests (SURVEY.md §5 #4).

Hypothesis drives the pure-python/DuckDB properties densely; the
Spark-backed keyset property uses one DataFrame and many cursors in a
single session to keep job counts sane."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airline_data_pipeline_spark.operators.pagination import (
    decode_cursor,
    encode_cursor,
    keyset_predicate,
)


# ---------------------------------------------------------------------------
# floor-based rounding: python model == DuckDB's evaluation of sql_round
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    st.integers(min_value=0, max_value=6),
)
def test_sql_round_matches_python_model(x, n):
    from airline_data_pipeline_spark.functions.numeric import sql_round

    con = duckdb.connect()
    # CAST: bare numeric literals parse as DECIMAL in DuckDB; engine
    # queries always feed DOUBLE columns into sql_round
    got = con.execute(f"SELECT {sql_round(f'CAST({x} AS DOUBLE)', n)}").fetchone()[0]
    expected = math.floor(x * 10**n + 0.5) / 10**n
    assert got == expected
    con.close()


# ---------------------------------------------------------------------------
# cursor encode/decode roundtrip
# ---------------------------------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.dates(),
            st.text(
                alphabet=st.characters(
                    blacklist_characters=":", blacklist_categories=("Cs",)
                ),
                max_size=20,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_cursor_roundtrip(parts):
    cur = encode_cursor(*parts)
    decoded = decode_cursor(cur, len(parts))
    assert decoded == [str(p) for p in parts]


# ---------------------------------------------------------------------------
# keyset predicate == lexicographic tuple comparison (Spark-evaluated)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tuples_df(spark):
    rows = [
        (a, b, c)
        for a in range(4)
        for b in range(4)
        for c in range(4)
    ]
    return spark.createDataFrame(rows, "a int, b int, c int").cache()


def test_keyset_predicate_is_lexicographic(spark, tuples_df):
    all_rows = [(r["a"], r["b"], r["c"]) for r in tuples_df.collect()]
    for cursor in [(0, 0, 0), (1, 2, 3), (3, 3, 3), (2, 0, 1), (0, 3, 2)]:
        got = {
            (r["a"], r["b"], r["c"])
            for r in tuples_df.filter(
                keyset_predicate(["a", "b", "c"], list(cursor))
            ).collect()
        }
        expected = {t for t in all_rows if t > cursor}
        assert got == expected, cursor


# ---------------------------------------------------------------------------
# HHMM: minutes and display agree; corrected delay is inverse-consistent
# ---------------------------------------------------------------------------
def test_hhmm_minutes_display_consistency(spark):
    from airline_data_pipeline_spark.functions.timefmt import (
        hhmm_delay_minutes,
        hhmm_to_display,
        hhmm_to_minutes,
    )

    rows = [(float(h * 100 + m),) for h in range(0, 24, 3) for m in range(0, 60, 7)]
    df = spark.createDataFrame(rows, "t double")
    out = df.select(
        "t",
        hhmm_to_display(F.col("t")).alias("disp"),
        hhmm_to_minutes(F.col("t")).alias("mins"),
        hhmm_delay_minutes(F.col("t"), F.col("t")).alias("self_delay"),
    ).collect()
    for r in out:
        h, m = divmod(int(r["t"]), 100)
        assert r["disp"] == f"{h:02d}:{m:02d}"
        assert r["mins"] == h * 60 + m
        assert r["self_delay"] == 0
