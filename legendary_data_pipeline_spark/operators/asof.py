"""As-of join: match each left row to the LATEST right row with
right_ts <= left_ts per key (SURVEY.md §2.3 notes the reference lacks
range/as-of joins; this is the brief's named custom operator).

Spark has no native as-of join. The scalable implementation here is the
union + carry-forward trick:

1. tag right rows 0, left rows 1; union on (keys, ts, tag, payloads)
2. ONE window, partitioned by key, ordered by (ts, tag, tie): a
   `last(col, ignorenulls=True)` frame carries each right payload
   forward in time
3. keep left rows — each now holds the most recent right payload

One shuffle on the key, no range-explosion join, no per-key driver
loops — at 100 TB this is a sort within each key partition, and with
the input bucketed by key it is shuffle-free. (The naive alternative —
non-equi join `l.ts >= r.ts` + top-1 — builds O(L×R) pairs per key
before pruning.)

Ties: right rows are deduplicated to one row per (key, ts) first
(callers pick the winner via `right_tiebreak`), so results are
deterministic — engines disagree on which of several equal-ts right
rows ASOF picks otherwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    right_tiebreak: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Output = all left columns + `right_payload`
    columns (null when no right row qualifies for the left row's
    timestamp).

    `direction`:
    - "backward" (default): LATEST right row with right_ts <= left_ts
      (attribution: the click before the purchase).
    - "forward": EARLIEST right row with right_ts >= left_ts
      (next-event: the purchase after the click) — same union + one
      window plan, ordered descending so the carry runs backward in
      time.
    - "nearest": whichever of the backward/forward candidates is closer
      in time; ties prefer backward. Computed with BOTH window passes
      over the SAME unioned/shuffled frame — one exchange on the key,
      two in-partition sorts. Requires a numeric timestamp column
      (distances are compared arithmetically).

    All bounds are inclusive: a right row at exactly the left timestamp
    matches (right rows sort before left rows on timestamp ties).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest', "
            f"got {direction!r}"
        )
    if direction == "nearest":
        from pyspark.sql.types import NumericType

        for schema, col in ((left.schema, left_ts), (right.schema, right_ts)):
            dtype = schema[col].dataType
            if not isinstance(dtype, NumericType):
                raise TypeError(
                    "asof_join(direction='nearest') requires numeric "
                    "timestamp columns (time distances are compared "
                    f"arithmetically); {col!r} is {dtype.simpleString()} — "
                    "cast to epoch seconds/millis first"
                )
    keys = list(on)
    # one right row per (key, ts): latest under the tiebreak ordering
    if right_tiebreak is not None:
        w_dedup = Window.partitionBy(*keys, right_ts).orderBy(
            right_tiebreak.desc()
        )
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    left_cols = [c for c in left.columns if c not in keys and c != left_ts]
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_TAG),
        *[F.col(c) for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_TAG),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_payload
        ],
        *[F.col(c) for c in left_cols],
    )
    unioned = r_tagged.unionByName(l_tagged)

    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        carried = unioned.select(
            *keys,
            "__ts",
            _TAG,
            *[F.col(c) for c in left_cols],
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in right_payload
            ],
        )
    else:
        # Right rows carry their own __ts; left rows see the matched
        # right timestamp per direction via the tag guard.
        right_ts_marker = F.when(F.col(_TAG) == 0, F.col("__ts"))
        back_ts = F.last(right_ts_marker, ignorenulls=True).over(w_back)
        fwd_ts = F.last(right_ts_marker, ignorenulls=True).over(w_fwd)
        use_back = fwd_ts.isNull() | (
            back_ts.isNotNull()
            & ((F.col("__ts") - back_ts) <= (fwd_ts - F.col("__ts")))
        )
        carried = unioned.select(
            *keys,
            "__ts",
            _TAG,
            *[F.col(c) for c in left_cols],
            *[
                F.when(
                    use_back, F.last(F.col(c), ignorenulls=True).over(w_back)
                )
                .otherwise(F.last(F.col(c), ignorenulls=True).over(w_fwd))
                .alias(c)
                for c in right_payload
            ],
        )
    return carried.filter(F.col(_TAG) == 1).drop(_TAG).withColumnRenamed(
        "__ts", left_ts
    )
