"""Stream-stream click→purchase attribution (interval join).

The batch engine answers "which click preceded this purchase" with the
as-of join (operators/asof.py); continuously, the same question is a
STREAM-STREAM inner join with a time-interval predicate — the
Structured Streaming feature built for exactly this. Both sides carry
watermarks, and the interval bound (`click_time` within
[purchase_time − horizon, purchase_time]) is what lets Spark EVICT
buffered click state once the watermark passes the horizon: without the
bound the join state is unbounded and the query is rejected.

Batch parity (tests/test_attribution.py): the identical join predicate
over the static events table produces the identical pair set — the
streaming plan buffers and evicts, but never changes semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.streaming.snapshots import with_event_time


def split_clicks_purchases(
    events: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Project the two event substreams with renamed, join-ready
    columns (stream-stream joins need disjoint column names)."""
    timed = with_event_time(events)
    clicks = timed.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("click_user"),
        F.col("event_time").alias("click_time"),
    )
    purchases = timed.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("event_time").alias("purchase_time"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 60,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Every (purchase, prior click ≤ horizon) pair per user.

    Works identically on batch and streaming frames; on streams the
    watermarks + interval predicate bound the buffered state to the
    horizon plus the watermark delay. Downstream pick-one attribution
    (last click wins) is a per-purchase max — do it in the sink or
    batch-side, where late data has settled.
    """
    if clicks.isStreaming:
        clicks = clicks.withWatermark("click_time", watermark)
    if purchases.isStreaming:
        purchases = purchases.withWatermark("purchase_time", watermark)
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("click_time") <= F.col("purchase_time"))
        & (
            F.col("click_time")
            >= F.col("purchase_time")
            - F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    joined = purchases.join(clicks, cond)
    return joined.select(
        "purchase_event_id",
        "click_event_id",
        F.col("purchase_user").alias("user_id"),
        "purchase_time",
        "click_time",
        (
            F.unix_micros("purchase_time") - F.unix_micros("click_time")
        ).alias("lag_us"),
    )
