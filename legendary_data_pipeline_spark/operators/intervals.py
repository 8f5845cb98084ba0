"""Interval algebra: merge overlapping spans, measure coverage.

The temporal companion to sessionization (gap-based grouping of POINT
events) and SCD2 (state episodes): these operators take explicit
[start, end) SPANS — maintenance windows, user sessions, validity
ranges, ad flights — merge the overlapping/touching ones per key, and
report how much of the timeline each key actually covers. The classic
gaps-and-islands construction, kept exact-integer end to end.

Scale: one shuffle on the key; the island assignment is a running
window over each key's spans (bounded partitions), the merge is one
aggregation per island. No self-joins, no interval explosion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_intervals", "interval_coverage"]


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping or touching half-open [start, end) intervals
    per key into maximal disjoint spans.

    Semantics (all deterministic, exact integers):
    - Intervals TOUCHING end-to-start merge ([1,5) + [5,9) → [1,9)) —
      half-open convention, no gap between them.
    - Rows with NULL key, NULL endpoint, or end <= start are dropped
      (empty/invalid spans cover nothing; a NULL endpoint has no
      position).
    - Output per merged span: key..., start, end, n_source (how many
      input spans merged into it).

    Construction: order each key's spans by (start, end); a span opens
    a NEW island iff its start exceeds the running maximum end of all
    earlier spans; island id = running sum of the open flags; one
    aggregation per island. Two windows + one groupBy over a single
    key-partitioned Exchange.
    """
    keys = list(key_cols)
    s, e = F.col(start_col), F.col(end_col)
    d = df.select(*keys, s.alias("__s"), e.alias("__e")).where(
        s.isNotNull() & e.isNotNull() & (e > s)
    )
    for k in keys:
        d = d.where(F.col(k).isNotNull())
    wo = Window.partitionBy(*keys).orderBy(
        F.col("__s").asc(), F.col("__e").asc()
    )
    prev_max_end = F.max("__e").over(
        Window.partitionBy(*keys)
        .orderBy(F.col("__s").asc(), F.col("__e").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(opens).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.withColumn("__island", island)
        .groupBy(*keys, "__island")
        .agg(
            F.min("__s").alias(start_col),
            F.max("__e").alias(end_col),
            F.count(F.lit(1)).cast("long").alias("n_source"),
        )
        .drop("__island")
    )


def interval_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per-key coverage report over merged spans: how much of the
    timeline does each key actually cover, in how many disjoint spans,
    with how much internal gap?

    Output: key..., n_spans, covered (Σ span lengths), span (last end −
    first start), gaps (span − covered), all exact integers in the
    endpoints' unit. Built on `merge_intervals`, so double-counted
    overlap is impossible by construction.
    """
    keys = list(key_cols)
    merged = merge_intervals(df, keys, start_col, end_col)
    return merged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col(end_col) - F.col(start_col))
        .cast("long")
        .alias("covered"),
        (F.max(end_col) - F.min(start_col)).cast("long").alias("span"),
        (
            F.max(end_col)
            - F.min(start_col)
            - F.sum(F.col(end_col) - F.col(start_col))
        )
        .cast("long")
        .alias("gaps"),
    )
