"""Skew-mitigation operators match their unsalted equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.skew import (
    salted_count_sum,
    salted_join,
)


def _skewed_df(spark):
    # 90% of rows share one key — the hot-key shape salting targets.
    rows = [(0, i) for i in range(900)] + [(k, k * 10) for k in range(1, 101)]
    return spark.createDataFrame(rows, "k int, v int")


def test_salted_count_sum_matches_plain(spark):
    df = _skewed_df(spark)
    got = {
        r.k: (r.cnt, r.sum_v)
        for r in salted_count_sum(df, ["k"], sum_col="v")
        .withColumnRenamed("sum_v", "sum_v")
        .collect()
    }
    expected = {
        r.k: (r.cnt, r.sum_v)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == expected


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [(k, f"name-{k}") for k in range(0, 80)], "k int, name string"
    )
    got = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(fact, dim, ["k"], how="inner").collect()
    )
    expected = sorted(
        (r.k, r.v, r.name) for r in fact.join(dim, ["k"], "inner").collect()
    )
    assert got == expected


def test_salted_join_left(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame([(0, "hot")], "k int, name string")
    got = salted_join(fact, dim, ["k"], how="left")
    assert got.count() == fact.count()
    assert got.filter(F.col("name").isNull()).count() == 100


# ---------------------------------------------------------------------------
# join_skew_forecast
# ---------------------------------------------------------------------------


def test_join_skew_forecast_products_and_order(spark):
    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.operators.skew import (
        join_skew_forecast,
    )

    left = spark.createDataFrame(
        [("hot",)] * 5 + [("warm",)] * 2 + [("left_only",)],
        "k string",
    )
    right = spark.createDataFrame(
        [("hot",)] * 4 + [("warm",)] * 3 + [(None,)], "k string"
    )
    rows = join_skew_forecast(left, right, on=["k"], top_k=10).collect()
    got = [(r.k, r.n_left, r.n_right, r.n_out) for r in rows]
    # ordered by emitted-row contribution; unmatched/NULL keys absent
    assert got == [("hot", 5, 4, 20), ("warm", 2, 3, 6)]
    # top_k truncates
    assert (
        join_skew_forecast(left, right, on=["k"], top_k=1).count() == 1
    )
    _ = F  # silence unused-import lint in minimal envs


def test_join_skew_forecast_plan_is_topk_not_global_sort(spark):
    """The forecast must end in TakeOrderedAndProject over the count
    join — never a data-sized global Sort (the single-partition trap
    the operator exists to avoid paying)."""
    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.operators.skew import (
        join_skew_forecast,
    )

    left = spark.range(0, 1000).select((F.col("id") % 50).alias("k"))
    right = spark.range(0, 1000).select((F.col("id") % 20).alias("k"))
    plan = (
        join_skew_forecast(left, right, on=["k"], top_k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
