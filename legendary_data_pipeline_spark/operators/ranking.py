"""Best-of-group selection via window ranking (SURVEY.md §2.5 W1/W2, §2.4 A4).

The reference's core rollup picks ONE row per (item, currency, day) by a
priority ordering (`scripts/pricing/03_build_market_price_daily.js:107-170`):
`ROW_NUMBER() OVER (PARTITION BY ... ORDER BY src_rank, type_rank, value DESC)`
then `WHERE rn = 1`.

Spark-first notes for 100 TB:
- `row_number` over a window is one shuffle on the partition keys; with
  the input already partitioned/bucketed by the same keys it is
  shuffle-free. Filter(rn=1) is evaluated inside the window stage.
- Order columns MUST form a total order within each partition (append a
  unique tie-breaker) or the picked row is nondeterministic under retries
  — the reference has the same latent issue on value ties (03:146).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def best_of_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    rank_col: str = "rn",
) -> DataFrame:
    """Keep exactly one row per partition, the first under `order_by`."""
    window = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(window))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k per partition; keeps the rank column (1-based)."""
    window = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(window)).filter(
        F.col(rank_col) <= k
    )
