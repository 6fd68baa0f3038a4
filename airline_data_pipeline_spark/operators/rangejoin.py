"""Interval / range join (SURVEY.md J4 — the non-as-of variant).

Problem: `a JOIN b ON a.key = b.key AND b.ts BETWEEN a.ts AND a.ts + Δ`.
A naive non-equi join degenerates to a per-key cross product; Spark has
no native interval join. The scalable pattern is **bucketization**:

1. quantize time into buckets of width Δ;
2. the left row joins buckets [t, t+Δ] → at most 2 bucket keys;
3. equi-join on (key, bucket) — a plain shuffled hash join;
4. re-apply the exact range predicate to discard bucket-edge misses.

Cost: each left row is duplicated ≤2×; the join is an equi-join whose
key cardinality grows with time granularity — no cross product at any
scale. This is the same trick Flink's interval join and Spark's own
stream-stream join state layout use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_after(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs with the same key and
    right_ts ∈ [left_ts, left_ts + window_seconds].

    Returns left columns + suffixed right columns, one row per matching
    pair (use groupBy upstream for per-left aggregates).
    """
    rcols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    # microsecond precision end-to-end — unix_timestamp would truncate
    # to seconds and disagree with an exact-timestamp oracle at edges
    w = F.lit(window_seconds * 1_000_000).cast("long")

    def micros(c: Column) -> Column:
        # unix_micros accepts only session-TZ TIMESTAMP; cast first so
        # the operator also works on TIMESTAMP_NTZ columns from a bare
        # session that skipped io.readers.table()'s normalization.
        return F.unix_micros(c.cast("timestamp"))

    lmicros = micros(F.col(left_ts))
    lb = left.withColumn(
        "__bucket",
        F.explode(F.array(F.floor(lmicros / w), F.floor(lmicros / w) + 1)),
    )
    rb = right.select(
        F.col(key),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"{c}_r") for c in rcols],
    ).withColumn("__bucket", F.floor(micros(F.col("__rts")) / w))

    joined = lb.join(rb, on=[key, "__bucket"])
    exact: Column = (micros(F.col("__rts")) >= micros(F.col(left_ts))) & (
        micros(F.col("__rts")) <= micros(F.col(left_ts)) + w
    )
    return joined.filter(exact).drop("__bucket")
