"""Contracts for the robust-trend / EWMA family (X170-X171,
operators/stats.py `theil_sen_trend` / `ewma_anomalies`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.stats import (
    ewma_anomalies,
    theil_sen_trend,
)


def _series(spark, rows, schema="g string, t long, v long"):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Theil-Sen
# ---------------------------------------------------------------------------


def test_theil_sen_exact_line(spark):
    # perfect line v = 3t + 2: every pairwise slope is 3
    rows = [("a", t, 3 * t + 2) for t in range(10)]
    out = theil_sen_trend(
        _series(spark, rows), "t", "v", group_cols=["g"]
    ).collect()[0]
    assert out.n_points == 10 and out.n_pairs == 45
    assert out.slope == 3.0
    assert out.intercept == 2.0


def test_theil_sen_outlier_resistant(spark):
    # line v = 2t with ONE wild outlier at t=5: least squares moves,
    # the median slope does not (outlier corrupts only 9/45 pairs)
    rows = [("a", t, 2 * t) for t in range(10)]
    rows[5] = ("a", 5, 1000)
    out = theil_sen_trend(
        _series(spark, rows), "t", "v", group_cols=["g"]
    ).collect()[0]
    assert out.slope == 2.0


def test_theil_sen_median_of_pair_slopes(spark):
    # 3 points (0,0), (1,10), (2,12): slopes 10, 6, 2 → median 6;
    # intercept = median(v) - 6*median(t) = 10 - 6 = 4
    rows = [("a", 0, 0), ("a", 1, 10), ("a", 2, 12)]
    out = theil_sen_trend(
        _series(spark, rows), "t", "v", group_cols=["g"]
    ).collect()[0]
    assert out.slope == 6.0 and out.intercept == 4.0


def test_theil_sen_single_point_null(spark):
    rows = [("a", 1, 5)]
    out = theil_sen_trend(
        _series(spark, rows), "t", "v", group_cols=["g"]
    ).collect()[0]
    assert out.n_points == 1 and out.n_pairs == 0
    assert out.slope is None and out.intercept is None


def test_theil_sen_groups_isolated(spark):
    # slopes differ per group; pairs never cross groups
    rows = [("a", t, 5 * t) for t in range(5)] + [
        ("b", t, -2 * t) for t in range(5)
    ]
    out = {
        r.g: r
        for r in theil_sen_trend(
            _series(spark, rows), "t", "v", group_cols=["g"]
        ).collect()
    }
    assert out["a"].slope == 5.0 and out["b"].slope == -2.0
    assert out["a"].n_pairs == 10 and out["b"].n_pairs == 10


def test_theil_sen_max_points_guard(spark):
    rows = [("a", t, t) for t in range(30)]
    df = _series(spark, rows)
    with pytest.raises(Exception, match="max_points"):
        theil_sen_trend(
            df, "t", "v", group_cols=["g"], max_points=10
        ).collect()


def test_theil_sen_ungrouped(spark):
    rows = [("x", t, 7 * t + 1) for t in range(6)]
    out = theil_sen_trend(
        _series(spark, rows).drop("g"), "t", "v"
    ).collect()[0]
    assert out.slope == 7.0 and out.intercept == 1.0


# ---------------------------------------------------------------------------
# EWMA anomalies
# ---------------------------------------------------------------------------


def test_ewma_weights_and_head_nulls(spark):
    # constant series: every ewma equals the constant; head row NULL
    rows = [("a", t, 100) for t in range(12)]
    out = ewma_anomalies(
        _series(spark, rows), "t", "v", group_cols=["g"], k=8
    ).orderBy("t").collect()
    assert out[0].ewma is None and out[0].is_anomaly is None
    for r in out[1:]:
        assert r.ewma == 100.0 and r.resid == 0.0
        assert r.is_anomaly is False


def test_ewma_partial_window_exact(spark):
    # v = [10, 20, 40] with k=2 (weights lag1=2, lag2=1):
    # t1: only lag1=10 → ewma = 20/2 = 10
    # t2: lag1=20 (w2), lag2=10 (w1) → (40+10)/3 = 50/3
    rows = [("a", 0, 10), ("a", 1, 20), ("a", 2, 40)]
    out = ewma_anomalies(
        _series(spark, rows), "t", "v", group_cols=["g"], k=2
    ).orderBy("t").collect()
    assert out[0].ewma is None
    assert out[1].ewma == 10.0 and out[1].resid == 10.0
    assert out[2].ewma == 50.0 / 3.0
    assert out[2].resid == 40.0 - 50.0 / 3.0


def test_ewma_flags_spike(spark):
    # flat series with one big spike: spike flagged, neighbors not
    rows = [("a", t, 100) for t in range(20)]
    rows[15] = ("a", 15, 100000)
    out = {
        r.t: r
        for r in ewma_anomalies(
            _series(spark, rows), "t", "v", group_cols=["g"], k=4
        ).collect()
    }
    assert out[15].is_anomaly is True
    assert out[10].is_anomaly is False
    # the point AFTER the spike sees a contaminated baseline but a
    # modest residual relative to it — still should not crash
    assert out[16].resid is not None


def test_ewma_groups_isolated(spark):
    rows = [("a", t, 10) for t in range(6)] + [
        ("b", t, 1000) for t in range(6)
    ]
    out = ewma_anomalies(
        _series(spark, rows), "t", "v", group_cols=["g"], k=3
    ).collect()
    for r in out:
        if r.ewma is not None:
            assert r.ewma == (10.0 if r.g == "a" else 1000.0)


def test_ewma_k_validation(spark):
    df = _series(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="k must be"):
        ewma_anomalies(df, "t", "v", group_cols=["g"], k=0)


def test_theil_sen_null_group_retained(spark):
    # review regression: NULL is a group; its pairs and medians must
    # match up through null-safe joins.
    rows = [(None, t, 4 * t) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = theil_sen_trend(df, "t", "v", group_cols=["g"]).collect()
    assert len(out) == 1
    assert out[0].g is None and out[0].slope == 4.0
    assert out[0].n_pairs == 10


def test_ewma_null_group_retained(spark):
    rows = [(None, t, 50) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = ewma_anomalies(df, "t", "v", group_cols=["g"], k=2).collect()
    assert len(out) == 5
    flagged = [r for r in out if r.ewma is not None]
    assert flagged and all(r.ewma == 50.0 for r in flagged)


# ---------------------------------------------------------------------------
# Mann-Kendall (X187)
# ---------------------------------------------------------------------------


def test_mann_kendall_perfect_trend(spark):
    # strictly increasing: every pair concordant -> S = C(10,2) = 45,
    # tau = 1.0, no ties -> Var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125,
    # z = (45-1)/sqrt(125)
    from legendary_data_pipeline_spark.operators.stats import mann_kendall

    rows = [("a", t, 2 * t) for t in range(10)]
    out = mann_kendall(
        _series(spark, rows), "t", "v", group_cols=["g"]
    ).collect()[0]
    assert out.n_points == 10 and out.s == 45
    assert out.tau == 1.0
    assert out.z_e6 == round(44.0 / 125.0 ** 0.5 * 1e6)


def test_mann_kendall_tie_correction(spark):
    # values 1,1,2: pairs (1,1)=0, (1,2)=+1, (1,2)=+1 -> S=2;
    # tie group t=2 -> tie term 2*1*9 = 18;
    # Var = (3*2*11 - 18)/18 = 48/18; z = (2-1)/sqrt(48/18)
    from legendary_data_pipeline_spark.operators.stats import mann_kendall

    rows = [("a", 0, 1), ("a", 1, 1), ("a", 2, 2)]
    out = mann_kendall(
        _series(spark, rows), "t", "v", group_cols=["g"]
    ).collect()[0]
    assert out.s == 2
    assert out.tau == 2.0 / 3.0
    assert out.z_e6 == round(1.0 / (48.0 / 18.0) ** 0.5 * 1e6)


def test_mann_kendall_degenerate(spark):
    # all tied -> S=0, Var=0 -> z NULL; single point -> tau/z NULL
    from legendary_data_pipeline_spark.operators.stats import mann_kendall

    rows = [("a", 0, 5), ("a", 1, 5), ("a", 2, 5), ("b", 0, 1)]
    out = {
        r.g: r
        for r in mann_kendall(
            _series(spark, rows), "t", "v", group_cols=["g"]
        ).collect()
    }
    assert out["a"].s == 0 and out["a"].z_e6 is None
    assert out["b"].n_points == 1
    assert out["b"].tau is None and out["b"].z_e6 is None


def test_mann_kendall_sign_symmetry(spark):
    # decreasing series: S and z negate the increasing series
    from legendary_data_pipeline_spark.operators.stats import mann_kendall

    up = [("a", t, t) for t in range(8)]
    dn = [("a", t, -t) for t in range(8)]
    o_up = mann_kendall(_series(spark, up), "t", "v", group_cols=["g"]).collect()[0]
    o_dn = mann_kendall(_series(spark, dn), "t", "v", group_cols=["g"]).collect()[0]
    assert o_dn.s == -o_up.s and o_dn.z_e6 == -o_up.z_e6
    assert o_dn.tau == -o_up.tau


def test_mann_kendall_max_points_guard(spark):
    from legendary_data_pipeline_spark.operators.stats import mann_kendall

    rows = [("a", t, t) for t in range(30)]
    with pytest.raises(Exception, match="max_points"):
        mann_kendall(
            _series(spark, rows), "t", "v", group_cols=["g"], max_points=10
        ).collect()


# ---------------------------------------------------------------------------
# seasonal_decompose (X197)
# ---------------------------------------------------------------------------


def test_seasonal_decompose_linear_series(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        seasonal_decompose,
    )

    # perfectly linear v = t: interior trend = t, detrended = 0
    # everywhere -> seasonal 0, remainder 0; edges (t<3 or t>6) NULL
    rows = [("a", t, t) for t in range(10)]
    out = {
        r.day: r
        for r in seasonal_decompose(
            _series(spark, rows).withColumnRenamed("t", "day"),
            "day", "v", group_cols=["g"],
        ).collect()
    }
    for t in range(3, 7):
        assert out[t].trend == float(t)
        assert out[t].remainder == 0.0
    assert out[0].trend is None and out[9].trend is None


def test_seasonal_decompose_weekly_spike(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        seasonal_decompose,
    )

    # v = 10 on phase 0, else 3, 3 weeks: the phase-0 seasonal mean is
    # strictly the largest
    rows = [("a", t, 10 if t % 7 == 0 else 3) for t in range(21)]
    out = seasonal_decompose(
        _series(spark, rows).withColumnRenamed("t", "day"),
        "day", "v", group_cols=["g"],
    ).collect()
    by_phase = {}
    for r in out:
        if r.seasonal is not None:
            by_phase.setdefault(r.day % 7, set()).add(r.seasonal)
    # seasonal is constant within a phase
    assert all(len(v) == 1 for v in by_phase.values())
    assert max(by_phase, key=lambda p: next(iter(by_phase[p]))) == 0


def test_seasonal_decompose_gap_breaks_window(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        seasonal_decompose,
    )

    # day 5 missing: every window overlapping the gap holds < 7
    # points -> NULL trend there; windows clear of the gap recover
    rows = [("a", t, t) for t in range(16) if t != 5]
    out = {
        r.day: r
        for r in seasonal_decompose(
            _series(spark, rows).withColumnRenamed("t", "day"),
            "day", "v", group_cols=["g"],
        ).collect()
    }
    for t in (3, 4, 6, 7, 8):
        assert out[t].trend is None
    for t in (9, 10, 11, 12):
        assert out[t].trend == float(t)
    # period validation
    import pytest as _pt
    from legendary_data_pipeline_spark.operators.stats import (
        seasonal_decompose as _sd,
    )
    with _pt.raises(ValueError, match="odd"):
        _sd(_series(spark, rows), "t", "v", period=4)


# ---------------------------------------------------------------------------
# cross_correlation (X198)
# ---------------------------------------------------------------------------


def test_ccf_detects_lead(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        cross_correlation,
    )

    # B is A delayed by exactly 2 steps: r = 1 at lag +2
    vals = [1, 5, 2, 7, 3, 8]
    rows = [("A", t, v) for t, v in enumerate(vals)] + [
        ("B", t + 2, v) for t, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "s string, t long, v long")
    out = {
        r.lag: r
        for r in cross_correlation(
            df, "t", "v", "s", "A", "B", max_lag=3
        ).collect()
    }
    assert out[2].r_e6 == 1_000_000 and out[2].n == 6
    # two-point lags are trivially r = +/-1; compare only n >= 3
    assert all(
        out[lag].r_e6 < 1_000_000
        for lag in out
        if lag != 2 and out[lag].r_e6 is not None and out[lag].n >= 3
    )


def test_ccf_guards(spark):
    from legendary_data_pipeline_spark.operators.stats import (
        cross_correlation,
    )

    df = spark.createDataFrame(
        [("A", 0, 1)], "s string, t long, v long"
    )
    with pytest.raises(ValueError, match="must differ"):
        cross_correlation(df, "t", "v", "s", "A", "A")
    with pytest.raises(ValueError, match="max_lag"):
        cross_correlation(df, "t", "v", "s", "A", "B", max_lag=0)


# ---------------------------------------------------------------------------
# pop_growth (X203)
# ---------------------------------------------------------------------------


def test_pop_growth_alignment_and_gaps(spark):
    from legendary_data_pipeline_spark.operators.stats import pop_growth

    # days 0..9 with day 2 missing: day 9's prev (day 2) is NULL —
    # value alignment, not row alignment
    rows = [("a", t, 10 * (t + 1)) for t in range(10) if t != 2]
    out = {
        r.day: r
        for r in pop_growth(
            _series(spark, rows).withColumnRenamed("t", "day"),
            "day", "v", group_cols=["g"], lag=7,
        ).collect()
    }
    assert out[7].prev == 10 and out[7].diff == 70 and out[7].growth == 8.0
    assert out[9].prev is None and out[9].growth is None
    assert out[0].prev is None
    import pytest as _pt
    with _pt.raises(ValueError, match="lag"):
        pop_growth(_series(spark, rows), "t", "v", lag=0)


def test_pop_growth_zero_prev_null_growth(spark):
    from legendary_data_pipeline_spark.operators.stats import pop_growth

    rows = [("a", 0, 0), ("a", 1, 5)]
    out = {
        r.t: r
        for r in pop_growth(
            _series(spark, rows), "t", "v", group_cols=["g"], lag=1
        ).collect()
    }
    assert out[1].prev == 0 and out[1].growth is None and out[1].diff == 5
