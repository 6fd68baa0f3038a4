"""Cross-engine-deterministic rounding.

Spark's `round()` converts the double to its shortest decimal string
and rounds HALF_UP on decimal digits; DuckDB rounds on the binary
value. On half-boundary values (37704.575 stored as …5749999…) they
disagree by a full ulp of the target scale — which breaks oracle
value-hash comparison.

`round_half_up` instead computes floor(x·10ⁿ + 0.5)/10ⁿ — a pure
function of the binary value, so Spark and any oracle engine given the
same SQL formula produce bit-identical results. `sql_round()` emits
that same formula as SQL text for the oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, n: int = 2) -> Column:
    """floor(x·10ⁿ + 0.5) / 10ⁿ as double — engine-portable rounding."""
    p = float(10**n)
    return (F.floor(col * p + F.lit(0.5)) / p).cast("double")


def sql_round(expr: str, n: int = 2) -> str:
    """The same rounding as SQL text, for oracle queries."""
    p = 10**n
    return f"(FLOOR(({expr}) * {p} + 0.5) / {p})"
