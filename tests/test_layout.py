"""Range-partitioned layout: the on-disk property pruning depends on.

Reads the written parquet footers with pyarrow and asserts per-file key
ranges are pairwise DISJOINT (a random layout fails this — every file
spans the whole range), and that a point predicate reaches the scan as
a pushed filter.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from legendary_data_pipeline_spark.sources.layout import (
    write_range_partitioned,
)

N_FILES = 8


def _file_ranges(path: str, col: str):
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    return ranges


def test_range_layout_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_ranged")
    write_range_partitioned(orders, path, "o_custkey", N_FILES)

    ranges = sorted(_file_ranges(path, "o_custkey"))
    assert len(ranges) == N_FILES
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"

    # Round-trip integrity.
    back = spark.read.parquet(path)
    assert back.count() == orders.count()

    # The clustering predicate is pushed to the scan.
    probe = ranges[3][0]
    plan = (
        back.filter(back["o_custkey"] == probe)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert f"PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,{probe})]" in plan


def test_random_layout_fails_disjointness(spark, sf_dir, tmp_path):
    """Control: the same data written with hash repartitioning has every
    file spanning ~the full key range — the layout, not the format, is
    what buys pruning."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_hashed")
    orders.repartition(N_FILES).write.parquet(path)
    ranges = sorted(_file_ranges(path, "o_custkey"))
    overlaps = sum(
        1 for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]) if h1 > l2
    )
    assert overlaps == len(ranges) - 1
