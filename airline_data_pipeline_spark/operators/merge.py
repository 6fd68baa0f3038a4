"""Upsert / merge semantics over immutable snapshots.

The reference mutates rows in Postgres via ON CONFLICT upserts
(`/root/reference/data_ingestion/ingest.py` loads into tables the API
then serves); a Spark warehouse is append-only parquet, so the engine
expresses "latest version wins" as a *merge view*: union the base
snapshot with the delta, rank rows per key by version, keep rank 1.

Scale design: one shuffle on the merge key (the window partition); no
driver-side state. At warehouse scale the same expression compacts a
base + N deltas in one pass (union is free — no shuffle — and the
window shuffle is the only exchange). Ties are broken deterministically
by the tiebreaker columns so the merge is idempotent and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Merge ``delta`` into ``base``: for each key, the row with the
    highest ``version_col`` (then tiebreakers, descending) survives.

    Both inputs must share a schema; `unionByName` keeps the merge
    robust to column order drift between snapshot generations.
    """
    merged = base.unionByName(delta)
    order = [F.col(version_col).desc()] + [
        F.col(c).desc() for c in (tiebreakers or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
