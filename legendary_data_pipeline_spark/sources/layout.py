"""Write-side data layout: range-partitioned, sorted parquet.

At 100 TB the fastest scan is the one that never happens: parquet
readers prune row groups/files whose column min/max statistics exclude
the predicate, but statistics only help when the layout CLUSTERS values
— a randomly-laid-out table has every file spanning the full key range
and nothing prunes. `write_range_partitioned` is the engine's layout
primitive: `repartitionByRange` puts disjoint key ranges into separate
files, `sortWithinPartitions` tightens per-row-group stats inside each
file (the poor man's Z-order for a single clustering key).

Verification (test_layout.py) reads the parquet FOOTERS and asserts the
per-file key ranges are pairwise disjoint — the property pruning needs
— and that a point-lookup plan pushes the predicate to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_partitioned(
    df: DataFrame,
    path: str,
    key: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write `df` as `n_files` parquet files clustering `key`.

    Range partitioning samples the key distribution (Spark's
    RangePartitioner), so files are balanced by ROW COUNT even for
    skewed keys — unlike hash bucketing, which balances buckets but
    scatters ranges. Sorting within each partition makes every row
    group's min/max tight, so both file-level AND row-group-level
    pruning engage for range or point predicates on `key`.
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode(mode)
        .parquet(path)
    )


def z_order_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
):
    """Z-order (Morton) key column for multi-dimension clustering.

    Single-key range layout prunes one predicate column; Z-order
    interleaves the bits of SEVERAL columns so files cluster in every
    interleaved dimension at once — each file's footer range stays
    narrow on each column, and min/max pruning engages for predicates
    on any of them (the Delta OPTIMIZE ZORDER contract).

    Each column is min/max-scaled to `bits` bits (one metadata-scale
    aggregate to fetch the bounds), then interleaved with pure
    shift/mask column expressions — whole-stage codegen, no Python.
    Returns (key_column, bounds) so callers can log the bounds.
    """
    from pyspark.sql import functions as F

    k = len(cols)
    if k < 2:
        raise ValueError("z-ordering needs >= 2 columns")
    if bits * k > 62:
        raise ValueError(f"bits*cols = {bits * k} exceeds a long's capacity")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in cols],
    ).first()
    max_bucket = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = bounds[f"__min_{c}"], bounds[f"__max_{c}"]
        if lo is None or hi is None:
            # Empty frame or all-NULL column: degrade to bucket 0 for
            # every row (an empty write stays an empty write; NULLs
            # cluster together) instead of a driver TypeError.
            lo, hi = 0.0, 0.0
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(max_bucket),
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * max_bucket
                ).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), b * k + i
            )
    return z, bounds


def write_z_ordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write `df` clustered on the Z-order of `cols`: range-partition
    and sort by the Morton key, then drop it — the clustering lives in
    the file layout, not the schema."""
    z, _ = z_order_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
