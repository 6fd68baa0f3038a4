"""HHMM clock-time expressions (SURVEY.md ops F2, F5, F9; §7.3.1).

The US DOT format stores clock times as HHMM-encoded numbers
(1456.0 == 14:56). The reference reformats them with a row-wise Python
function applied per value (`data_processing/process.py:40-47`) and
subtracts them *as numbers* to derive delays
(`process.py:163-164`, `api/app.py:276-277`) — which is only correct
within a single hour.

Both behaviors are provided, as pure column expressions:

- `hhmm_to_display`       — "HH:MM" string (parity with `clean_time`)
- `hhmm_delay_naive`      — raw numeric subtraction (parity with the
                            reference, wrong across hour boundaries)
- `hhmm_delay_minutes`    — corrected true-minutes difference with
                            midnight wraparound (extension)

No UDFs: these compile to codegen'd JVM expressions, so the reformat
that costs the reference a Python call per value is free here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_int(col: Column) -> Column:
    return col.cast("int")


def hhmm_to_display(col: Column) -> Column:
    """HHMM number → 'HH:MM' string, null-safe (op F2).

    Parity with `clean_time` (`process.py:40-47`): zero-pad to 4,
    split 2/2, join with ':'. 1456.0 → '14:56', 5.0 → '00:05'.
    """
    padded = F.lpad(_as_int(col).cast("string"), 4, "0")
    return F.when(
        col.isNotNull(),
        F.concat_ws(":", F.substring(padded, 1, 2), F.substring(padded, 3, 2)),
    )


def hhmm_to_minutes(col: Column) -> Column:
    """HHMM number → minutes since midnight. 1456 → 896."""
    i = _as_int(col)
    return (F.floor(i / 100) * 60 + i % 100).cast("int")


def hhmm_delay_naive(actual: Column, scheduled: Column) -> Column:
    """actual − scheduled on raw HHMM numbers (reference parity, op F5).

    Matches `process.py:163-164` exactly, including the hour-boundary
    error (1502−1458 = 44, not 4 minutes). Null if either side is null.
    """
    return (actual.cast("double") - scheduled.cast("double")).cast("double")


def hhmm_delay_minutes(actual: Column, scheduled: Column) -> Column:
    """True minutes late with midnight wraparound (corrected extension).

    Differences are normalized into [-720, 720): a flight scheduled
    23:50 departing 00:10 is +20, not -1420.
    """
    diff = hhmm_to_minutes(actual) - hhmm_to_minutes(scheduled)
    # pmod, not %: Spark's % keeps the dividend's sign, which would
    # leave cross-midnight negatives unwrapped.
    wrapped = F.pmod(diff + 720, F.lit(1440)) - 720
    return F.when(actual.isNotNull() & scheduled.isNotNull(), wrapped.cast("int"))
