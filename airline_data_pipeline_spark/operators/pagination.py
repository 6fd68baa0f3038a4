"""Keyset pagination with stable row ids (SURVEY.md P6, W1, O1, O2, O5).

The reference's API paginates with `reset_index()` row numbers and a
base64 `date:index` cursor (`api/app.py:46-58,134,147-168`) — stable
only because the data is one CSV read in fixed order. The distributed
analog needs a *deterministic total order*:

- `with_row_ids` assigns `row_number()` over an explicit ordering
  (never `monotonically_increasing_id`, which is partition-layout
  dependent and unfit for cursors).
- At scale, prefer pure keyset pagination on a natural key
  (`flight_date, flight_number, origin`): the cursor predicate prunes
  partitions and the global row_number sort disappears entirely —
  `keyset_page` implements that path.
"""

from __future__ import annotations

import base64

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_row_ids(df: DataFrame, order_by: list[str], id_col: str = "row_id") -> DataFrame:
    """Deterministic row ids via row_number over a total order (W1).

    The single-partition window is the price of a *global* dense id —
    acceptable for serving-sized (post-filter) data, wrong for bulk
    data at scale; use `keyset_page` there instead.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(id_col, F.row_number().over(w))


def encode_cursor(*parts) -> str:
    """Opaque cursor: base64 of ':'-joined key parts (op O5, driver-side)."""
    raw = ":".join(str(p) for p in parts)
    return base64.urlsafe_b64encode(raw.encode()).decode()


def decode_cursor(cursor: str, n_parts: int) -> list[str]:
    raw = base64.urlsafe_b64decode(cursor.encode()).decode()
    parts = raw.split(":")
    if len(parts) != n_parts:
        raise ValueError(f"malformed cursor: expected {n_parts} parts")
    return parts


def keyset_predicate(keys: list[str], after: list) -> Column:
    """Lexicographic '(k1,k2,...) > (v1,v2,...)' as a boolean expression
    (op P6 generalized to any key arity).

    For keys (a, b, c): a>v1 OR (a=v1 AND b>v2) OR (a=v1 AND b=v2 AND c>v3).
    Against a date-partitioned table the leading disjunct prunes
    partitions, so each page reads only the tail of the data.
    """
    clauses: list[Column] = []
    for i, key in enumerate(keys):
        clause = F.col(key) > F.lit(after[i])
        for j in range(i):
            clause = (F.col(keys[j]) == F.lit(after[j])) & clause
        clauses.append(clause)
    pred = clauses[0]
    for c in clauses[1:]:
        pred = pred | c
    return pred


def keyset_page(
    df: DataFrame,
    keys: list[str],
    limit: int = 100,
    cursor: str | None = None,
    max_limit: int = 1000,
) -> tuple[DataFrame, Column]:
    """One page: filter past the cursor, order by the key, limit.

    Mirrors the reference's filter→sort→head chain
    (`api/app.py:147-159`) with its ≤1000 page cap (`api/app.py:131`).
    Returns (page_df, key_tuple_column) — the caller encodes the last
    row's key tuple as the next cursor.
    """
    limit = min(limit, max_limit)
    out = df
    if cursor is not None:
        after = decode_cursor(cursor, len(keys))
        out = out.filter(keyset_predicate(keys, after))
    out = out.orderBy(*[F.col(k) for k in keys]).limit(limit)
    return out, F.concat_ws(":", *[F.col(k).cast("string") for k in keys])
