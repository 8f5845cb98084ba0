"""mixture_allocate contracts: budget conservation, capacity caps,
proportionality, saturation redistribution, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.curation import mixture_allocate


def _src(spark, rows):
    return spark.createDataFrame(rows, "source string, capacity long, weight long")


def test_no_saturation_exact_proportions(spark):
    src = _src(spark, [("a", 1000, 3), ("b", 1000, 2), ("c", 1000, 5)])
    out = {r["source"]: r for r in mixture_allocate(src, 100).collect()}
    assert (out["a"]["allocation"], out["b"]["allocation"],
            out["c"]["allocation"]) == (30, 20, 50)
    assert not any(r["saturated"] for r in out.values())


def test_saturation_redistributes(spark):
    # c wants 50 of 100 but only has 10 → its 40 extra goes to a, b (3:2)
    src = _src(spark, [("a", 1000, 3), ("b", 1000, 2), ("c", 10, 5)])
    out = {r["source"]: r for r in mixture_allocate(src, 100).collect()}
    assert out["c"]["allocation"] == 10 and out["c"]["saturated"]
    assert out["a"]["allocation"] == 54 and out["b"]["allocation"] == 36
    assert sum(r["allocation"] for r in out.values()) == 100


def test_budget_exceeds_capacity(spark):
    src = _src(spark, [("a", 5, 1), ("b", 7, 9)])
    out = {r["source"]: r for r in mixture_allocate(src, 10_000).collect()}
    assert out["a"]["allocation"] == 5 and out["b"]["allocation"] == 7
    assert all(r["saturated"] for r in out.values())


def test_remainder_distribution_and_conservation(spark):
    # 100 across weights 1,1,1 → 33/33/34, extra to smallest source id
    src = _src(spark, [("x", 500, 1), ("y", 500, 1), ("z", 500, 1)])
    out = {r["source"]: r["allocation"] for r in mixture_allocate(src, 100).collect()}
    assert sorted(out.values()) == [33, 33, 34]
    # all three have the same fractional remainder (100 % 3 = 1 unit to
    # distribute) → earliest source id gets it
    assert out["x"] == 34


def test_invalid_rows_dropped_and_zero_budget(spark):
    src = _src(
        spark,
        [("a", 10, 2), ("bad_w", 10, 0), ("bad_c", -1, 2), (None, 10, 2)],
    )
    out = mixture_allocate(src, 6).collect()
    assert [r["source"] for r in out] == ["a"]
    assert out[0]["allocation"] == 6
    zero = mixture_allocate(src, 0).collect()
    assert all(r["allocation"] == 0 for r in zero)


def test_conservation_invariant_randomized(spark):
    import random

    rng = random.Random(5)
    rows = [
        (f"s{i:02d}", rng.randrange(0, 200), rng.randrange(1, 9))
        for i in range(25)
    ]
    src = _src(spark, rows)
    for budget in (0, 37, 500, 10_000):
        out = mixture_allocate(src, budget).collect()
        total_cap = sum(c for _, c, _ in rows)
        assert sum(r["allocation"] for r in out) == min(budget, total_cap)
        assert all(r["allocation"] <= r["capacity"] for r in out)
        assert all(r["allocation"] >= 0 for r in out)
    # partition invariance
    a = sorted(map(tuple, mixture_allocate(src, 500).collect()))
    b = sorted(map(tuple, mixture_allocate(src.repartition(7), 500).collect()))
    assert a == b
