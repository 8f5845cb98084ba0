"""Contracts for the Count-Min sketch (operators/cms.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.cms import (
    cms_build,
    cms_merge,
    cms_query,
)

DEPTH, WIDTH = 4, 64  # small width to force collisions in-test


def _items(spark, n=2000, mod=100):
    # zipf-ish: key k appears ~n/mod times, key 0 much more often
    return spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.lit(0))
        .otherwise(F.col("id") % mod)
        .alias("k")
    )


def test_never_undercounts_and_bounded(spark):
    df = _items(spark)
    n_total = df.count()
    sk = cms_build(df, "k", DEPTH, WIDTH)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_query(sk, exact, "k", DEPTH, WIDTH)
    rows = est.collect()
    assert len(rows) == exact.count()
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
        # classic bound holds with margin on this fixture (eps = 2/W)
        assert r["cms_est"] <= r["exact_cnt"] + 2 * n_total / WIDTH * 4, r


def test_cell_frame_is_bounded(spark):
    sk = cms_build(_items(spark), "k", DEPTH, WIDTH)
    assert sk.count() <= DEPTH * WIDTH
    # total mass per row equals the item count
    per_row = sk.groupBy("row_idx").agg(F.sum("cnt").alias("m")).collect()
    assert {r["m"] for r in per_row} == {2000}


def test_merge_equals_whole(spark):
    df = _items(spark)
    a = df.where(F.col("k") < 50)
    b = df.where(F.col("k") >= 50)
    merged = cms_merge(
        cms_build(a, "k", DEPTH, WIDTH), cms_build(b, "k", DEPTH, WIDTH)
    )
    whole = cms_build(df, "k", DEPTH, WIDTH)
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_unseen_key_estimates_small(spark):
    df = _items(spark)
    sk = cms_build(df, "k", DEPTH, WIDTH)
    probes = spark.createDataFrame([(99991,), (99992,)], "k long")
    rows = cms_query(sk, probes, "k", DEPTH, WIDTH).collect()
    for r in rows:
        # may collide (overestimate) but never negative
        assert 0 <= r["cms_est"] <= 2000


def test_empty_input(spark):
    empty = spark.createDataFrame([], "k long")
    sk = cms_build(empty, "k", DEPTH, WIDTH)
    assert sk.count() == 0
    probes = spark.createDataFrame([(1,)], "k long")
    rows = cms_query(sk, probes, "k", DEPTH, WIDTH).collect()
    assert rows[0]["cms_est"] == 0


def test_inner_product_never_undercounts(spark):
    from legendary_data_pipeline_spark.operators.cms import (
        cms_inner_product,
    )

    a = _items(spark, n=1000, mod=50)
    b = _items(spark, n=500, mod=25)
    sa = cms_build(a, "k", DEPTH, WIDTH)
    sb = cms_build(b, "k", DEPTH, WIDTH)
    est = cms_inner_product(sa, sb).collect()[0]["cms_est"]
    exact = (
        a.groupBy("k").count().withColumnRenamed("count", "ca")
        .join(b.groupBy("k").count().withColumnRenamed("count", "cb"), "k")
        .selectExpr("sum(ca * cb) as e")
        .collect()[0]["e"]
    )
    assert est >= exact
    # bound with slack: 2 * Na * Nb / W per row, d rows of margin
    assert est <= exact + 2 * 1000 * 500 / WIDTH * 4


def test_inner_product_disjoint_and_empty(spark):
    from legendary_data_pipeline_spark.operators.cms import (
        cms_inner_product,
    )

    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    sa = cms_build(a, "k", DEPTH, WIDTH)
    sb = cms_build(b, "k", DEPTH, WIDTH)
    est = cms_inner_product(sa, sb).collect()[0]["cms_est"]
    assert est in (0, 1)  # disjoint keys: 0 unless all rows collide
    empty = cms_build(spark.createDataFrame([], "k long"), "k", DEPTH, WIDTH)
    assert cms_inner_product(sa, empty).collect()[0]["cms_est"] == 0
    assert cms_inner_product(empty, sb).collect()[0]["cms_est"] == 0


def test_weighted_build_equals_per_row_build(spark):
    items = _items(spark)
    per_row = cms_build(items, "k", DEPTH, WIDTH)
    agg = items.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("w"))
    weighted = cms_build(agg, "k", DEPTH, WIDTH, weight_col="w")
    a = sorted(tuple(r) for r in per_row.collect())
    b = sorted(tuple(r) for r in weighted.collect())
    assert a == b  # bit-identical cell tables
