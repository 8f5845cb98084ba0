"""Slowly-changing-dimension Type 2 history from a change log.

The reference system versions rows in place (keyed upserts,
`revalueCollection.mjs`-style UPDATE sweeps — SURVEY.md S5-S8); the
warehouse-grade companion is the SCD2 form: one row per (key, state
EPISODE) with a validity interval, so any past point in time can be
reconstructed exactly. This module builds that history declaratively
from an append-only change log — the shape a streaming upsert feed or
CDC topic naturally produces — and reads it back as-of any timestamp.

Scale: everything is per-key window arithmetic (shuffle on the key,
bounded partitions), one aggregation per episode, and a broadcast-free
point-in-time read that is a plain filter. No driver-side state, no
iteration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_from_changelog", "scd2_apply_changelog", "scd2_snapshot_at"]


def scd2_from_changelog(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Collapse an append-only change log into SCD Type-2 validity
    intervals: one row per (key, EPISODE of identical attributes),

        key..., attr..., valid_from, valid_to, is_current

    where `valid_to` is the next episode's `valid_from` (half-open
    [from, to) intervals — the join-friendly convention) and NULL on
    the current episode.

    Semantics, all deterministic:
    - Rows with a NULL key or NULL timestamp are dropped (no identity /
      no position on the timeline).
    - Several rows on the SAME (key, ts) collapse to the one with the
      greatest attribute struct (a total order — last-writer-wins needs
      a tiebreak, and max(struct) is the engine-stable one; feed a
      sequence column as the first attr if you have one).
    - Consecutive identical attribute tuples merge into one episode
      (null-safe comparison — NULL attr values are real states).

    Plan: one shuffle on the key; two windows (change flag + running
    episode id, then the episode-successor lead) and one episode-level
    aggregation, all over the same key partitioning — Catalyst reuses
    a single Exchange. Episode count, not row count, sizes the output.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    ts = F.col(ts_col)
    d = df.select(*keys, ts_col, *attrs).where(ts.isNotNull())
    for k in keys:
        d = d.where(F.col(k).isNotNull())

    # last-writer-wins within one (key, ts): keep max attribute struct
    wk = Window.partitionBy(*keys, ts_col)
    d = (
        d.withColumn("__astruct", F.struct(*[F.col(a) for a in attrs]))
        .withColumn("__amax", F.max("__astruct").over(wk))
        .where(F.col("__astruct").eqNullSafe(F.col("__amax")))
        .drop("__amax")
        .distinct()
    )

    wo = Window.partitionBy(*keys).orderBy(ts.asc())
    prev = F.lag("__astruct").over(wo)
    changed = (~F.col("__astruct").eqNullSafe(prev)) | prev.isNull()
    seg = F.sum(changed.cast("long")).over(
        Window.partitionBy(*keys)
        .orderBy(ts.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    episodes = (
        d.withColumn("__seg", seg)
        .groupBy(*keys, "__seg", *attrs)
        .agg(F.min(ts_col).alias("valid_from"))
    )
    we = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    valid_to = F.lead("valid_from").over(we)
    return episodes.select(
        *keys,
        *attrs,
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


def scd2_apply_changelog(
    existing: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Incremental SCD2 maintenance from a CHANGE LOG: fold a new batch into an
    `existing` SCD2 table (the `scd2_from_changelog` output shape) and
    return the updated history.

    An episode IS a change event at its `valid_from` — so maintenance
    reduces to re-deriving episodes from (existing episodes replayed as
    events) ∪ (new changes), which inherits every semantic of the batch
    builder for free: late/out-of-order changes splice into the middle
    of history correctly, a change equal to the neighboring state merges
    instead of fragmenting, and applying batches incrementally is
    EXACTLY equivalent to one full rebuild (parity-tested).

    Complements `operators.upsert.scd2_apply` (the MERGE form): that one
    takes a KEY-UNIQUE latest-state batch and touches only current
    rows — cheaper per batch, but late events cannot splice. This form
    accepts raw, unordered, multi-event logs and guarantees
    rebuild-equivalence.

    `existing` may be empty (bootstrap). Plan: union + the builder's one
    key shuffle. At 100 TB partition the stored table by key bucket and
    apply per-partition — only touched keys need rewriting (standard
    MERGE practice; the math here is per-key independent).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    replay = existing.select(
        *keys, F.col("valid_from").alias(ts_col), *attrs
    )
    combined = replay.unionByName(
        changes.select(*keys, ts_col, *attrs)
    )
    return scd2_from_changelog(combined, keys, ts_col, attrs)


def scd2_snapshot_at(scd2: DataFrame, at: Column) -> DataFrame:
    """Point-in-time read of an SCD2 table: the rows whose half-open
    [valid_from, valid_to) interval contains `at`. A plain filter —
    partition/file pruning applies if the table is laid out by
    valid_from; no join, no window."""
    return scd2.where(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    )
