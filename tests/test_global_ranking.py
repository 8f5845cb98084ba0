"""Distributed global ranking: exactness vs the naive single-partition
window, NTILE-arithmetic equivalence, and plan-shape guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.ranking import (
    global_row_number,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    # Values with heavy ties (mod 7) so bucket bounds hit duplicate
    # boundary values; unique id as tie-breaker.
    return spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_global_row_number_matches_naive_window(spark, skewed_df):
    got = global_row_number(
        skewed_df,
        bucket_by=F.col("v"),
        order_by=[F.asc("v"), F.asc("id")],
        rn_col="rn",
        num_buckets=16,
    )
    naive = skewed_df.withColumn(
        "rn_naive",
        F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id"))).cast("long"),
    )
    diffs = (
        got.join(naive, "id")
        .filter(F.col("rn") != F.col("rn_naive"))
        .count()
    )
    assert diffs == 0


def test_ntile_from_rank_matches_builtin_ntile(spark, skewed_df):
    for k in (3, 10):
        got = global_row_number(
            skewed_df,
            bucket_by=F.col("v"),
            order_by=[F.asc("v"), F.asc("id")],
            rn_col="rn",
            total_col="n",
            num_buckets=8,
        ).select("id", ntile_from_rank(F.col("rn"), F.col("n"), k).alias("tile"))
        naive = skewed_df.select(
            "id",
            F.ntile(k)
            .over(Window.orderBy(F.asc("v"), F.asc("id")))
            .alias("tile_naive"),
        )
        diffs = (
            got.join(naive, "id")
            .filter(F.col("tile") != F.col("tile_naive"))
            .count()
        )
        assert diffs == 0, f"k={k}"


def test_degenerate_all_equal_values(spark):
    df = spark.range(0, 100).select(
        F.col("id"), F.lit(1.0).alias("v")
    )
    got = global_row_number(
        df, bucket_by=F.col("v"), order_by=[F.asc("v"), F.asc("id")],
        rn_col="rn", num_buckets=8,
    )
    rows = sorted((r["id"], r["rn"]) for r in got.collect())
    assert rows == [(i, i + 1) for i in range(100)]


@pytest.mark.parametrize("nulls", ["first", "last"])
def test_null_bucket_routing_matches_order_spec(spark, nulls):
    df = spark.range(0, 500).select(
        F.col("id"),
        F.when(F.col("id") % 9 == 0, None)
        .otherwise((F.col("id") % 7).cast("double"))
        .alias("v"),
    )
    v_order = F.asc_nulls_first("v") if nulls == "first" else F.asc_nulls_last("v")
    got = global_row_number(
        df,
        bucket_by=F.col("v"),
        order_by=[v_order, F.asc("id")],
        rn_col="rn",
        num_buckets=8,
        nulls=nulls,
    )
    naive = df.withColumn(
        "rn_naive",
        F.row_number().over(Window.orderBy(v_order, F.asc("id"))).cast("long"),
    )
    diffs = got.join(naive, "id").filter(F.col("rn") != F.col("rn_naive")).count()
    assert diffs == 0


def test_null_bucket_rejects_bad_spec(spark):
    df = spark.range(3).select(F.col("id"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="nulls must be"):
        global_row_number(
            df, bucket_by=F.col("v"), order_by=[F.asc("v")], nulls="middle"
        )


def test_plan_has_no_data_sized_single_partition_window(spark, skewed_df):
    """The ONLY single-partition exchange allowed is the metadata offsets
    frame (post-aggregation, ≤num_buckets rows). The data-path window
    must be partitioned by the bucket column."""
    got = global_row_number(
        skewed_df,
        bucket_by=F.col("v"),
        order_by=[F.asc("v"), F.asc("id")],
        rn_col="rn",
        num_buckets=16,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # Data-path window is bucket-partitioned:
    assert "windowspecdefinition(__bucket" in plan
    # Every single-partition exchange must feed the metadata counts frame:
    # its input subtree (the text after the marker, before any further
    # Exchange) must start with the per-__bucket counts HashAggregate,
    # never a data-sized scan/sort.
    segments = plan.split("Exchange SinglePartition")
    assert len(segments) > 1, "expected the metadata offsets exchange"
    for seg in segments[1:]:
        subtree = seg.split("Exchange", 1)[0]
        assert "HashAggregate" in subtree and "__bucket" in subtree, (
            "SinglePartition exchange not above the __bucket counts "
            f"aggregate:\n{subtree[:600]}"
        )
