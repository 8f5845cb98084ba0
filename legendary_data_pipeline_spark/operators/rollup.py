"""Percentile / last-value rollups (SURVEY.md §2.4 A1/A2/A6, §2.3 J9).

Re-expresses `scripts/pricing/10_rollup_market_values_daily.mjs:33-92`:
per (card_key, grade) over a 180-day lookback —
`percentile_cont(0.5/0.25/0.75)`, `COUNT(*)`, `MAX(sold_at)`, the latest
sale (correlated `ORDER BY sold_at DESC LIMIT 1` subquery), and an
A/B/C/D confidence bucket from the sample count (10:78-83).

Spark-first notes:
- the correlated last-sale subquery becomes `max_by(value,
  struct(ts, tie_breakers...))` inside the SAME groupBy as the
  percentiles — one aggregation, map-side combinable, no window sort
  and no re-join, unlike the reference's stats-CTE + correlated lookup.
- `percentile(...)` is exact (matches `percentile_cont` on doubles
  bit-for-bit); at 100 TB swap in `percentile_approx` — the API keeps
  the choice a parameter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def confidence_bucket(count_col: Column) -> Column:
    """A/B/C/D bucket by sample count (10:78-83)."""
    return (
        F.when(count_col >= 10, "A")
        .when(count_col >= 5, "B")
        .when(count_col >= 2, "C")
        .otherwise("D")
    )


def percentile_rollup(
    df: DataFrame,
    group_keys: Sequence[str],
    value_col: str,
    ts_col: str,
    tie_breakers: Sequence[str] = (),
    percentiles: Sequence[float] = (0.25, 0.5, 0.75),
    exact: bool = True,
) -> DataFrame:
    """Grouped percentile stats + deterministic last-value per group.

    `tie_breakers` complete the ordering for the "latest" row so the
    last-value is deterministic when `ts_col` ties (the reference's
    `LIMIT 1` is nondeterministic there). The "latest" ordering is the
    lexicographic max of struct(ts, *tie_breakers) — all components
    descend, which is exactly the reference's `ORDER BY sold_at DESC`.
    """
    pcts = ", ".join(str(p) for p in percentiles)
    pct_fn = "percentile" if exact else "percentile_approx"
    latest_key = F.struct(F.col(ts_col), *[F.col(c) for c in tie_breakers])
    aggs = [
        F.expr(f"{pct_fn}({value_col}, array({pcts}))").alias("__pcts"),
        F.count(F.lit(1)).alias("sales_count"),
        F.max(ts_col).alias("last_ts"),
        F.max_by(F.col(value_col), latest_key).alias("last_value"),
    ]
    out = df.groupBy(*group_keys).agg(*aggs)
    for i, p in enumerate(percentiles):
        label = str(int(p * 100))
        out = out.withColumn(f"p{label}", F.col("__pcts")[i])
    return out.drop("__pcts").withColumn(
        "confidence", confidence_bucket(F.col("sales_count"))
    )
