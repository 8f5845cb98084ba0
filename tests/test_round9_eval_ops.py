"""Contracts for X180-X182: McNemar paired test, Jensen-Shannon
divergence pairs, rank-biased overlap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.hypotests import mcnemar_test
from legendary_data_pipeline_spark.operators.profiling import (
    js_divergence_pairs,
)
from legendary_data_pipeline_spark.operators.retrieval import (
    rbo_at_k,
    rbo_suffix,
)


# ---------------------------------------------------------------------------
# McNemar
# ---------------------------------------------------------------------------


def test_mcnemar_hand_computed(spark):
    # b (only_a) = 15, c (only_b) = 5:
    # chi2 = (|15-5|-1)^2 / 20 = 81/20 = 4.05
    rows = (
        [(True, True)] * 30
        + [(False, False)] * 50
        + [(True, False)] * 15
        + [(False, True)] * 5
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    out = mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]
    assert (out.both_yes, out.both_no, out.only_a, out.only_b) == (
        30, 50, 15, 5,
    )
    assert out.n == 100
    assert out.chi2 == 81.0 / 20.0


def test_mcnemar_perfect_agreement_null(spark):
    rows = [(True, True)] * 5 + [(False, False)] * 5
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    out = mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]
    assert out.chi2 is None


def test_mcnemar_continuity_floor_and_nulls(spark):
    # |b - c| = 1 → corrected difference floors at 0 → chi2 = 0
    rows = [(True, False), (False, True), (False, True), (None, True)]
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    out = mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]
    assert out.n == 3  # NULL pair dropped
    assert out.chi2 == 0.0
    # without the correction: (b-c)^2/(b+c) = 1/3
    out2 = mcnemar_test(
        df, F.col("a"), F.col("b"), continuity=False
    ).collect()[0]
    assert out2.chi2 == 1.0 / 3.0


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence
# ---------------------------------------------------------------------------


def _items(spark, rows):
    return spark.createDataFrame(rows, "g string, w string")


def test_jsd_identical_zero_disjoint_ln2(spark):
    rows = (
        [("a", "x")] * 3 + [("a", "y")] * 2
        + [("b", "x")] * 3 + [("b", "y")] * 2   # identical to a
        + [("c", "z")] * 5                        # disjoint from both
    )
    out = {
        (r.group_a, r.group_b): r
        for r in js_divergence_pairs(_items(spark, rows), "g", "w").collect()
    }
    assert out[("a", "b")].jsd_e6 == 0
    assert out[("a", "b")].jsd_norm_e6 == 0
    # disjoint supports → JSD = ln 2 → normalized 1e6
    assert out[("a", "c")].jsd_norm_e6 == 1_000_000
    assert out[("b", "c")].jsd_norm_e6 == 1_000_000


def test_jsd_hand_computed(spark):
    # a: {x: 1/2, y: 1/2}; b: {x: 1}:
    # m(x) = 3/4, m(y) = 1/4
    # JSD = 0.5*(0.5 ln(0.5/0.75) + 0.5 ln(0.5/0.25)) + 0.5*(1 ln(1/0.75))
    rows = [("a", "x"), ("a", "y"), ("b", "x")]
    jsd = 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    ) + 0.5 * (1.0 * math.log(1.0 / 0.75))
    out = js_divergence_pairs(_items(spark, rows), "g", "w").collect()[0]
    assert out.n_items == 2
    assert abs(out.jsd_e6 - round(jsd * 1e6)) <= 1


def test_jsd_symmetric_and_bounded(spark):
    rows = [("a", w) for w in "the quick brown fox".split()] * 3 + [
        ("b", w) for w in "the slow red fox jumps".split()
    ] * 2
    out = js_divergence_pairs(_items(spark, rows), "g", "w").collect()
    assert len(out) == 1
    assert 0 <= out[0].jsd_norm_e6 <= 1_000_000


# ---------------------------------------------------------------------------
# RBO
# ---------------------------------------------------------------------------


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank int"
    )


def test_rbo_identical_rankings_near_one(spark):
    rows = [(1, 100 + r, r) for r in range(1, 11)]
    a = _ranking(spark, rows)
    out = rbo_at_k(a, a, k=10, p=0.9).collect()[0]
    # truncated RBO of identical prefixes = sum of weights
    # = (1-p) * sum p^(d-1) = 1 - p^10
    assert out.n_overlap == 10
    assert out.rbo == pytest.approx(1 - 0.9**10, abs=1e-9)


def test_rbo_disjoint_zero_and_missing_query(spark):
    a = _ranking(spark, [(1, 100, 1), (2, 200, 1)])
    b = _ranking(spark, [(1, 999, 1)])
    out = {r.query_id: r for r in rbo_at_k(a, b, k=10).collect()}
    assert out[1].rbo == 0.0 and out[1].n_overlap == 0
    assert out[2].rbo == 0.0  # query absent from b entirely


def test_rbo_top_weighted(spark):
    # same single shared item: agreeing at rank 1 must beat rank 10
    a1 = _ranking(spark, [(1, 5, 1)])
    b1 = _ranking(spark, [(1, 5, 1)])
    a2 = _ranking(spark, [(2, 5, 10)])
    b2 = _ranking(spark, [(2, 5, 10)])
    top = rbo_at_k(a1, b1, k=10).collect()[0].rbo
    bottom = rbo_at_k(a2, b2, k=10).collect()[0].rbo
    assert top > bottom > 0


def test_rbo_suffix_exact_identity(spark):
    # suffix[0] equals the total weight sum: LCM * sum over d of
    # coef_d/LCM = sum (1/d... — check the defining identity instead:
    # suffix[m-1] - suffix[m] == coef_m for every interior depth
    lcm, suffix = rbo_suffix(10, 0.9)
    from decimal import Decimal

    for m in range(1, 10):
        diff = suffix[m - 1] - suffix[m]
        assert diff > Decimal(0)
    assert lcm == 2520


def test_rbo_p_validation(spark):
    a = _ranking(spark, [(1, 1, 1)])
    with pytest.raises(ValueError, match="p must be"):
        rbo_at_k(a, a, p=1.0)


# ---------------------------------------------------------------------------
# semantic decontamination (X183)
# ---------------------------------------------------------------------------


def test_semantic_decontamination_flags_near_copy(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        semantic_decontamination,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0]),   # near-copy of bench 100
            (2, [0.0, 0.0, 1.0]),     # orthogonal to both
            (3, [0.0, -1.0, 0.0]),    # anti-parallel
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in semantic_decontamination(
            train, bench, tau_e6=900_000
        ).collect()
    }
    assert out[1].contaminated is True
    assert out[1].nearest_benchmark_id == 100
    assert out[2].contaminated is False and out[2].max_cos_e6 == 0
    # anti-parallel to 101 but orthogonal to 100: the MAX is 0
    assert out[3].max_cos_e6 == 0 and not out[3].contaminated
    assert out[3].nearest_benchmark_id == 100


def test_semantic_decontamination_empty_benchmark(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        semantic_decontamination,
    )

    train = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    bench = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    out = semantic_decontamination(train, bench, tau_e6=1).collect()
    assert len(out) == 1
    assert out[0].max_cos_e6 is None and out[0].contaminated is False
