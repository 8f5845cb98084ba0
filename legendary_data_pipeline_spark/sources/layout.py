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
