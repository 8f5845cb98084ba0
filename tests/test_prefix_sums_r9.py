"""Round-9 distributed order-statistics prefix sums
(`operators.stats.distributed_below_counts`) — the single-partition-free
replacement for `Window.orderBy(value)` cumulative sums over
distinct-value frames.

Contracts pinned here:
- bit-parity with the sequential global window (exclusive + inclusive),
  for long and decimal(38,0) counts, under several partition counts
  (results must be a pure function of the data);
- grouped form: parity with `Window.partitionBy(groups).orderBy(value)`
  including NULL group keys (null-safe join semantics);
- gini_concentration coarse path ≡ window path.
"""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F


def _seq_cum(rows, inclusive):
    """Driver-side oracle: sequential prefix sums over sorted values."""
    rows = sorted(rows)
    out, run = [], 0
    for v, c in rows:
        if inclusive:
            run += c
            out.append((v, run))
        else:
            out.append((v, run))
            run += c
    return dict(out)


def test_parity_with_sequential_window(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        distributed_below_counts,
    )

    random.seed(11)
    vals = [random.randint(-200, 200) for _ in range(500)]
    pairs = [(v, random.randint(1, 9)) for v in set(vals)]
    df = spark.createDataFrame(pairs, "v long, c long")
    for inclusive in (False, True):
        oracle = _seq_cum(pairs, inclusive)
        for parts in (1, 7):
            got = dict(
                distributed_below_counts(
                    df.repartition(parts), "v", ["c"], inclusive=inclusive
                )
                .select("v", "c_cum")
                .collect()
            )
            assert got == oracle, (inclusive, parts)


def test_decimal_counts_and_multiple_columns(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        distributed_below_counts,
    )

    df = spark.createDataFrame(
        [(i, i + 1, 2 * i + 1) for i in range(100)], "v long, a long, b long"
    ).select("v", F.col("a").cast("decimal(38,0)").alias("a"), "b")
    out = distributed_below_counts(df, "v", ["a", "b"]).collect()
    for r in out:
        v = r["v"]
        # Σ_{i<v} (i+1) and Σ_{i<v} (2i+1) in closed form
        assert int(r["a_cum"]) == v * (v + 1) // 2
        assert r["b_cum"] == v * v


def test_grouped_parity_with_partitioned_window(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        distributed_below_counts,
    )

    random.seed(23)
    rows = [
        (random.choice(["x", "y", None]), random.randint(0, 60))
        for _ in range(800)
    ]
    g = (
        spark.createDataFrame(rows, "g string, v long")
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("g").orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    expected = sorted(
        [
            tuple(r)
            for r in g.select(
                "g",
                "v",
                F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum"),
            ).collect()
        ],
        key=str,
    )
    got = sorted(
        [
            tuple(r)
            for r in distributed_below_counts(
                g, "v", ["c"], group_cols=["g"]
            )
            .select("g", "v", "c_cum")
            .collect()
        ],
        key=str,
    )
    assert got == expected  # NULL group included — null-safe join


def test_gini_coarse_path_matches_window_path(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        gini_concentration,
    )

    random.seed(5)
    rows = [
        (random.choice(["p1", "p2", None]), random.randint(0, 400))
        for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, "g string, cents long")
    a = sorted(
        [tuple(r) for r in gini_concentration(df, "cents", ["g"]).collect()],
        key=str,
    )
    b = sorted(
        [
            tuple(r)
            for r in gini_concentration(
                df, "cents", ["g"], coarse_groups=False
            ).collect()
        ],
        key=str,
    )
    assert a == b
    # global (ungrouped) form too
    assert (
        gini_concentration(df, "cents").collect()
        == gini_concentration(df, "cents", coarse_groups=False).collect()
    )


def test_empty_frame(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        distributed_below_counts,
    )

    df = spark.createDataFrame([], "v long, c long")
    assert distributed_below_counts(df, "v", ["c"]).collect() == []
