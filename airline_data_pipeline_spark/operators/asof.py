"""As-of (nearest-earlier) join (SURVEY.md J4).

Spark has no native as-of join. The motivating case from the reference
domain: attach the latest weather observation at or before each
flight's departure. Two implementations:

- `asof_join` (default): the **union + window trick** — one shuffle on
  (key, time), no range cross-product. Right rows are unioned into the
  left stream, sorted within each key, and `last(..., ignorenulls)`
  carries the most recent right-side values forward onto left rows.
  Cost: one shuffle + one window pass, regardless of table sizes —
  this is the 100 TB path.

- `asof_join_pandas`: per-key `pd.merge_asof` via applyInPandas, for
  semantics the window trick can't express (tolerance windows,
  nearest-in-either-direction). Arrow-batched; one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, the most recent right row with
    right.on <= left.on (matching `by` keys if given).

    Ties on the time column: the right row wins (it is 'already known'
    at that instant), matching merge_asof's allow_exact_matches=True.
    """
    by = by or []
    rcols = right_cols or [c for c in right.columns if c != on and c not in by]

    lhs = left.withColumn("__is_left", F.lit(1))
    for c in rcols:
        lhs = lhs.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    ).withColumn("__is_left", F.lit(0))
    for c in left.columns:
        if c not in by and c != on:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs)
    # Within a key, order by (time, is_left): right rows at time t sort
    # before left rows at t, so last(...) includes exact-time matches.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in rcols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
        )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance=None,
) -> DataFrame:
    """Grouped-map as-of join via pd.merge_asof (Arrow-batched).

    Use only when tolerance/nearest semantics are needed; the window
    variant is cheaper. Requires `by` (a single key column) so groups
    are bounded.
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(f.name + "_asof", f.dataType)
        for f in right.schema.fields
        if f.name not in (on, by)
    ]
    out_schema = T.StructType(out_fields)
    rcols = [f.name for f in right.schema.fields if f.name not in (on, by)]

    lhs = left.withColumn("__side", F.lit("L"))
    rhs = right.withColumn("__side", F.lit("R"))
    # Align schemas for a single grouped pass keyed on `by`.
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in right.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    both = lhs.unionByName(rhs)

    # Close over plain strings only — capturing DataFrames/StructFields
    # would drag the SparkContext into the pickled task closure.
    left_names = [f.name for f in left.schema.fields]
    out_names = [f.name for f in out_fields]

    def merge(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        l = pdf[pdf["__side"] == "L"].sort_values(on)
        r = pdf[pdf["__side"] == "R"].sort_values(on)
        lf = l[left_names]
        rf = r[[by, on] + rcols].rename(columns={c: c + "_asof" for c in rcols})
        merged = pd.merge_asof(lf, rf, on=on, by=by, tolerance=tolerance)
        return merged[out_names]

    return both.groupBy(by).applyInPandas(merge, schema=out_schema)
