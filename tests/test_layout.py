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


def test_z_order_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order's contract: EVERY interleaved column's per-file footer
    range is a small fraction of the global range (both prune), where a
    single-key sort nails one column and leaves the other unprunable.
    Measured on sf0.01/16 files: ~0.42/0.30 z-ordered vs 0.06/1.0
    single-key."""
    from legendary_data_pipeline_spark.sources.layout import (
        write_z_ordered,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_z_ordered(orders, zpath, ["o_custkey", "o_totalprice"], N_FILES)
    write_range_partitioned(orders, spath, "o_custkey", N_FILES)

    def avg_frac(path, col):
        rs = _file_ranges(path, col)
        glo = max(h for _, h in rs) - min(lo for lo, _ in rs)
        return sum(h - lo for lo, h in rs) / len(rs) / glo

    for col in ("o_custkey", "o_totalprice"):
        assert avg_frac(zpath, col) < 0.7, col
    # Control: single-key layout cannot cluster the second column.
    assert avg_frac(spath, "o_totalprice") > 0.9

    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert "__z" not in back.columns


# ---------------------------------------------------------------------------
# small-file compaction
# ---------------------------------------------------------------------------


def test_compaction_plan_and_rewrite(spark, tmp_path):
    from legendary_data_pipeline_spark.operators.profiling import (
        table_checksum,
    )
    from legendary_data_pipeline_spark.sources.layout import (
        compact_table,
        plan_compaction,
        table_file_stats,
    )

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    # Simulate incremental-append fragmentation: 40 tiny files.
    spark.range(4000).selectExpr(
        "id", "id % 7 AS k", "CAST(id AS STRING) AS v"
    ).repartition(40).write.parquet(src)

    stats = table_file_stats(spark, src)
    assert stats.count() == 40
    assert stats.filter("bytes <= 0").count() == 0

    plan = plan_compaction(spark, src, target_bytes=10 * 1024 * 1024)
    assert plan["n_files"] == 40
    assert plan["needed"] and plan["n_target"] < 40

    before = table_checksum(
        spark.read.parquet(src), ["id", "k", "v"]
    ).collect()[0]
    applied = compact_table(
        spark, src, out, target_bytes=10 * 1024 * 1024
    )
    assert applied["n_target"] == table_file_stats(spark, out).count()
    after = table_checksum(
        spark.read.parquet(out), ["id", "k", "v"]
    ).collect()[0]
    # Order-independent row checksum proves the rewrite lost nothing.
    assert before == after

    # A well-sized table does not trigger.
    assert not plan_compaction(
        spark, out, target_bytes=10 * 1024 * 1024
    )["needed"]


def test_compaction_with_sort_key_restores_clustering(spark, tmp_path):
    from legendary_data_pipeline_spark.sources.layout import (
        compact_table,
        table_file_stats,
    )

    src = str(tmp_path / "frag2")
    out = str(tmp_path / "clustered")
    spark.range(5000).selectExpr("id", "id % 100 AS k").repartition(
        25
    ).write.parquet(src)
    compact_table(
        spark, src, out, target_bytes=64 * 1024 * 1024, sort_key="id"
    )
    files = [r["file"] for r in table_file_stats(spark, out).collect()]
    assert len(files) == 1  # tiny table → single target file
    got = spark.read.parquet(out)
    assert got.count() == 5000


def test_checksum_invariant_across_storage_formats(spark, tmp_path):
    """The migration-validation primitive end-to-end across FORMATS:
    the same rows written as parquet and ORC produce the identical
    order-independent checksum — exactly the check a real
    format/engine migration runs on both sides."""
    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.operators.profiling import (
        table_checksum,
    )

    df = spark.range(5_000).select(
        F.col("id"),
        (F.col("id") % 97).cast("string").alias("s"),
        (F.col("id") * 13 % 10_000).alias("cents"),
    )
    pq, orc = str(tmp_path / "t_pq"), str(tmp_path / "t_orc")
    df.write.parquet(pq)
    df.write.orc(orc)
    cols = ["id", "s", "cents"]
    a = table_checksum(spark.read.parquet(pq), cols).collect()[0]
    b = table_checksum(spark.read.orc(orc), cols).collect()[0]
    assert (a.n_rows, a.checksum) == (b.n_rows, b.checksum)
    # and a single-cell mutation on one side is caught
    mutated = spark.read.orc(orc).withColumn(
        "cents", F.when(F.col("id") == 4_999, F.col("cents") + 1).otherwise(F.col("cents"))
    )
    c = table_checksum(mutated, cols).collect()[0]
    assert c.checksum != a.checksum
