"""Contracts for the hypothesis-test family (X166-X169,
operators/hypotests.py): hand-computed statistics against scipy-style
reference values (computed offline, pinned as literals), tie handling,
degenerate-input NULLs, and partitioning invariance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.hypotests import (
    anova_oneway,
    kruskal_wallis,
    mann_whitney_u,
    welch_t_test,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------


def test_mwu_hand_computed_no_ties(spark):
    # a = [1, 4, 5], b = [2, 3]: pairs where a > b: (4>2),(4>3),(5>2),
    # (5>3) = 4; ties 0 → U_a = 4. n_a=3, n_b=2.
    rows = [("a", 1), ("a", 4), ("a", 5), ("b", 2), ("b", 3)]
    out = mann_whitney_u(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.n_a == 3 and out.n_b == 2
    assert out.u1 == 4.0
    assert out.auc_ab == pytest.approx(4 / 6)
    # z = (U - n_a n_b / 2)/sqrt(n_a n_b (n+1)/12) = (4-3)/sqrt(3) =
    # 0.57735..., e6 = 577350
    assert out.z_e6 == 577350


def test_mwu_ties_half_credit(spark):
    # a = [2, 2], b = [2]: every pair tied → U_a = 2 * 0.5 = 1.0
    rows = [("a", 2), ("a", 2), ("b", 2)]
    out = mann_whitney_u(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.u1 == 1.0
    assert out.auc_ab == 0.5
    # all values tied → variance 0 → NULL z
    assert out.z_e6 is None


def test_mwu_empty_group_null(spark):
    rows = [("a", 1), ("a", 2)]
    out = mann_whitney_u(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.n_b == 0
    assert out.z_e6 is None and out.auc_ab is None


def test_mwu_and_welch_reject_equal_groups(spark):
    # group_a == group_b puts every row in both sides (n_a = n_b = N)
    # while the pooled tie count counts rows once — the statistic is
    # silently meaningless, so the operators must fail loudly (r10)
    rows = [("a", 1), ("a", 2), ("b", 3)]
    with pytest.raises(ValueError, match="must differ"):
        mann_whitney_u(_df(spark, rows), "v", "g", "a", "a")
    with pytest.raises(ValueError, match="must differ"):
        welch_t_test(_df(spark, rows), "v", "g", "b", "b")


def test_mwu_matches_auc_identity(spark):
    # U/(n_a n_b) must equal the tie-credited AUC of "is group a"
    # against v (scores); cross-check with a direct O(n^2) count.
    import itertools

    rows = [("a", 3), ("a", 7), ("a", 7), ("b", 1), ("b", 7), ("b", 9),
            ("b", 3)]
    a_vals = [v for g, v in rows if g == "a"]
    b_vals = [v for g, v in rows if g == "b"]
    u = sum(
        1.0 if x > y else 0.5 if x == y else 0.0
        for x, y in itertools.product(a_vals, b_vals)
    )
    out = mann_whitney_u(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.u1 == u
    assert out.auc_ab == pytest.approx(u / (len(a_vals) * len(b_vals)))


def test_mwu_partition_invariance(spark):
    rows = [("a", i % 7) for i in range(50)] + [
        ("b", i % 5) for i in range(40)
    ]
    df1 = _df(spark, rows).repartition(1)
    df8 = _df(spark, rows).repartition(8)
    r1 = mann_whitney_u(df1, "v", "g", "a", "b").collect()[0]
    r8 = mann_whitney_u(df8, "v", "g", "a", "b").collect()[0]
    assert r1 == r8


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------


def test_kruskal_hand_computed(spark):
    # scipy.stats.kruskal([1,2,3],[4,5,6],[7,8,9]) = 7.2 exactly
    # (no ties: ranks 1..9, R = [6, 15, 24],
    #  H = 12/(9*10) * (36/3+225/3+576/3) - 3*10 = 7.2)
    rows = (
        [("a", 1), ("a", 2), ("a", 3)]
        + [("b", 4), ("b", 5), ("b", 6)]
        + [("c", 7), ("c", 8), ("c", 9)]
    )
    out = kruskal_wallis(_df(spark, rows), "v", "g").collect()[0]
    assert out.n == 9 and out.n_groups == 3 and out.dof == 2
    assert out.h_e6 == 7_200_000


def test_kruskal_tie_correction(spark):
    # a=[1,1,2], b=[2,3,3]: avg ranks 1.5/3.5/5.5, R_a=6.5, R_b=14.5,
    # H = 12/42 * (6.5^2/3 + 14.5^2/3) - 21 = 64/21; tie sum = 3*(8-2)
    # = 18, factor = 1 - 18/210 = 32/35 → H_c = (64/21)/(32/35) = 10/3
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 3), ("b", 3)]
    out = kruskal_wallis(_df(spark, rows), "v", "g").collect()[0]
    assert out.h_e6 == 3333333


def test_kruskal_degenerate(spark):
    # single group → NULL; all values identical → tie factor 0 → NULL
    one = kruskal_wallis(
        _df(spark, [("a", 1), ("a", 2)]), "v", "g"
    ).collect()[0]
    assert one.h_e6 is None and one.n_groups == 1
    tied = kruskal_wallis(
        _df(spark, [("a", 5), ("b", 5), ("c", 5)]), "v", "g"
    ).collect()[0]
    assert tied.h_e6 is None


# ---------------------------------------------------------------------------
# Welch's t
# ---------------------------------------------------------------------------


def test_welch_hand_computed(spark):
    # a = [1,2,3,4], b = [2,4,6,8,10]:
    # mean_a=2.5 var_a=5/3; mean_b=6 var_b=10
    # se2 = (5/3)/4 + 10/5 = 29/12, t = -3.5/sqrt(29/12) = -2.2514367
    # dof = se2^2 / ((5/12)^2/3 + 2^2/4) = 5.5207877
    rows = [("a", 1), ("a", 2), ("a", 3), ("a", 4)] + [
        ("b", v) for v in (2, 4, 6, 8, 10)
    ]
    out = welch_t_test(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.n_a == 4 and out.n_b == 5
    assert out.mean_a == 2.5 and out.mean_b == 6.0
    assert out.t_e6 == -2251436
    assert out.dof_e6 == 5520788


def test_welch_degenerate(spark):
    # n_a = 1 → NULL t (variance undefined); means still emitted
    rows = [("a", 3), ("b", 1), ("b", 2), ("b", 3)]
    out = welch_t_test(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.mean_a == 3.0
    assert out.t_e6 is None and out.dof_e6 is None
    # both groups constant → se2 = 0 → NULL
    rows2 = [("a", 5), ("a", 5), ("b", 7), ("b", 7)]
    out2 = welch_t_test(_df(spark, rows2), "v", "g", "a", "b").collect()[0]
    assert out2.t_e6 is None


# ---------------------------------------------------------------------------
# One-way ANOVA
# ---------------------------------------------------------------------------


def test_anova_hand_computed(spark):
    # scipy.stats.f_oneway([1,2,3],[2,3,4],[5,6,7]):
    # means 2,3,6; grand 11/3; SSB = 3*((2-11/3)^2+(3-11/3)^2+(5-11/3)^2
    # for 6: (6-11/3)^2) = 3*(25/9+4/9+49/9) = 26; SSW = 2+2+2 = 6
    # F = (26/2)/(6/6) = 13; eta^2 = 26/32 = 0.8125
    rows = (
        [("a", 1), ("a", 2), ("a", 3)]
        + [("b", 2), ("b", 3), ("b", 4)]
        + [("c", 5), ("c", 6), ("c", 7)]
    )
    out = anova_oneway(_df(spark, rows), "v", "g").collect()[0]
    assert out.n == 9 and out.n_groups == 3
    assert out.dof_between == 2 and out.dof_within == 6
    assert out.f_e6 == 13_000_000
    assert out.eta_sq_e6 == 812500


def test_anova_degenerate(spark):
    # zero within-group variance → NULL F, eta^2 = 1
    rows = [("a", 1), ("a", 1), ("b", 9), ("b", 9)]
    out = anova_oneway(_df(spark, rows), "v", "g").collect()[0]
    assert out.f_e6 is None
    assert out.eta_sq_e6 == 1_000_000
    # single group → NULL F
    one = anova_oneway(
        _df(spark, [("a", 1), ("a", 2), ("a", 4)]), "v", "g"
    ).collect()[0]
    assert one.f_e6 is None


def test_anova_null_rows_dropped(spark):
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4), (None, 99), ("c", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = anova_oneway(df, "v", "g").collect()[0]
    assert out.n == 4 and out.n_groups == 2


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank (X184)
# ---------------------------------------------------------------------------


def test_wilcoxon_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        wilcoxon_signed_rank,
    )

    # d = a-b = [1, -2, 3, 4, 5]: |d| ranks 1..5 (no ties),
    # W+ = 1+3+4+5 = 13; z = (13-7.5)/sqrt(13.75) = 1.483240
    rows = [(11, 10), (10, 12), (13, 10), (14, 10), (15, 10)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert out.n_pairs == 5 and out.n_nonzero == 5
    assert out.w_plus == 13.0
    assert out.z_e6 == 1483240


def test_wilcoxon_zeros_drop_and_ties(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        wilcoxon_signed_rank,
    )

    # two zero diffs drop; |d| = [2, 2] tie → avg rank 1.5 each,
    # one positive → W+ = 1.5
    rows = [(5, 5), (7, 7), (8, 6), (4, 6)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert out.n_pairs == 4 and out.n_nonzero == 2
    assert out.w_plus == 1.5


def test_wilcoxon_degenerate(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        wilcoxon_signed_rank,
    )

    # all diffs zero → no nonzero pairs → NULL z
    rows = [(3, 3), (4, 4)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert out.n_pairs == 2 and out.n_nonzero == 0
    assert out.z_e6 is None
    # NULL sides drop from n_pairs entirely
    rows2 = [(3, None), (None, 4), (6, 5)]
    df2 = spark.createDataFrame(rows2, "a long, b long")
    out2 = wilcoxon_signed_rank(df2, "a", "b").collect()[0]
    assert out2.n_pairs == 1


# ---------------------------------------------------------------------------
# Cochran's Q (X185)
# ---------------------------------------------------------------------------


def test_cochrans_q_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.hypotests import cochrans_q

    rows = [
        (True, True, False),
        (True, False, False),
        (True, True, True),
        (False, False, False),
    ]
    df = spark.createDataFrame(rows, "f0 boolean, f1 boolean, f2 boolean")
    out = cochrans_q(df, ["f0", "f1", "f2"]).collect()[0]
    # C = (3,2,1), T = 6; num = 9+0+9 = 18; den = 3*(18-14) = 12
    assert out.n == 4 and out.k == 3 and out.dof == 2
    assert out.q == 3.0


def test_cochrans_q_degenerate_and_nulls(spark):
    from legendary_data_pipeline_spark.operators.hypotests import cochrans_q

    # all-concordant rows → denominator 0 → NULL q
    rows = [(True, True), (False, False)]
    df = spark.createDataFrame(rows, "f0 boolean, f1 boolean")
    out = cochrans_q(df, ["f0", "f1"]).collect()[0]
    assert out.q is None
    # NULL flags drop the whole row
    rows2 = [(True, False), (None, True), (False, True)]
    df2 = spark.createDataFrame(rows2, "f0 boolean, f1 boolean")
    out2 = cochrans_q(df2, ["f0", "f1"]).collect()[0]
    assert out2.n == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="two flag"):
        cochrans_q(df2, ["f0"])


# ---------------------------------------------------------------------------
# Brown-Forsythe (X186)
# ---------------------------------------------------------------------------


def test_brown_forsythe_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        brown_forsythe,
    )

    # a = [1,2,3] (median 2, spreads 1,0,1); b = [10,20,30]
    # (median 20, spreads 10,0,10): W = ANOVA-F over the spreads.
    # spreads means: 2/3 vs 20/3; scipy.stats.levene(center='median')
    # gives W = 3.0 for this input.
    rows = (
        [("a", 1), ("a", 2), ("a", 3)]
        + [("b", 10), ("b", 20), ("b", 30)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = brown_forsythe(df, "v", "g").collect()[0]
    assert out.n == 6 and out.n_groups == 2
    # reference: z_a = [1,0,1], z_b = [10,0,10]; grand mean 11/3
    # SSB = 3*((2/3-11/3)^2 + (20/3-11/3)^2) = 54; SSW = 2/3 + 200/3
    # F = (54/1)/( (202/3)/4 ) = 54*12/202 = 3.207921
    assert out.w_e6 == 3207921


def test_brown_forsythe_equal_spread_zero(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        brown_forsythe,
    )

    # both groups have IDENTICAL spread shape → W = 0
    rows = (
        [("a", 0), ("a", 10), ("a", 20)]
        + [("b", 100), ("b", 110), ("b", 120)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = brown_forsythe(df, "v", "g").collect()[0]
    assert out.w_e6 == 0


def test_brown_forsythe_half_median_exact(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        brown_forsythe,
    )

    # even group size → median on a half (2.5): the doubled-spread
    # trick must stay exact (|2v - 5| = odd integers)
    rows = [("a", 1), ("a", 2), ("a", 3), ("a", 4),
            ("b", 1), ("b", 100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = brown_forsythe(df, "v", "g").collect()[0]
    assert out.n == 6 and out.w_e6 is not None


# ---------------------------------------------------------------------------
# Cliff's delta (X188)
# ---------------------------------------------------------------------------


def test_cliffs_delta_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        cliffs_delta,
    )

    # a = [1,2,3], b = [2,2,4]: gt pairs (a>b) = 2 (3>2, 3>2),
    # lt pairs = 5 (1<2,1<2,1<4, 2<4, 3<4) -> delta = (2-5)/9 = -1/3
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 2), ("b", 4)]
    out = cliffs_delta(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.n_a == 3 and out.n_b == 3
    assert out.gt_pairs == 2 and out.lt_pairs == 5
    assert out.delta == (2.0 - 5.0) / 9.0


def test_cliffs_delta_extremes_and_guard(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        cliffs_delta,
    )

    # complete dominance -> +1; empty side -> NULL; equal labels raise
    rows = [("a", 10), ("a", 11), ("b", 1), ("b", 2)]
    out = cliffs_delta(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert out.delta == 1.0
    empty = cliffs_delta(_df(spark, rows), "v", "g", "a", "zzz").collect()[0]
    assert empty.n_b == 0 and empty.delta is None
    with pytest.raises(ValueError, match="must differ"):
        cliffs_delta(_df(spark, rows), "v", "g", "a", "a")


def test_cliffs_delta_matches_mwu_auc_identity(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        cliffs_delta,
    )

    # delta = 2*AUC - 1 (both rank-based; AUC gives ties half credit)
    rows = [("a", i % 7) for i in range(40)] + [
        ("b", (i * 3) % 9) for i in range(25)
    ]
    d = cliffs_delta(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    m = mann_whitney_u(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    assert abs(d.delta - (2.0 * m.auc_ab - 1.0)) < 1e-12


# ---------------------------------------------------------------------------
# Runs test (X189)
# ---------------------------------------------------------------------------


def _series(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, v long")


def test_runs_test_alternating_and_monotone(spark):
    from legendary_data_pipeline_spark.operators.hypotests import runs_test

    # alternating around median 4: sides 1,0,1,0,1,0 -> 6 runs,
    # E[R] = 4, Var = 1.2, z = 2/sqrt(1.2)
    alt = [("a", t, v) for t, v in enumerate([5, 1, 6, 2, 7, 3])]
    out = runs_test(_series(spark, alt), "t", "v", group_cols=["g"]).collect()[0]
    assert (out.n_above, out.n_below, out.runs) == (3, 3, 6)
    assert out.z_e6 == round(2.0 / 1.2 ** 0.5 * 1e6)
    # monotone: sides 0,0,0,1,1,1 -> 2 runs, z negated
    mono = [("a", t, v) for t, v in enumerate([1, 2, 3, 4, 5, 6])]
    o2 = runs_test(_series(spark, mono), "t", "v", group_cols=["g"]).collect()[0]
    assert o2.runs == 2
    assert o2.z_e6 == -out.z_e6


def test_runs_test_median_values_drop_and_degenerate(spark):
    from legendary_data_pipeline_spark.operators.hypotests import runs_test

    # [1,2,2,3]: median 2 -> the two 2s drop; kept sides 0,1 -> 2 runs
    # of n1=n2=1 -> Var = 0 -> z NULL
    rows = [("a", t, v) for t, v in enumerate([1, 2, 2, 3])]
    out = runs_test(_series(spark, rows), "t", "v", group_cols=["g"]).collect()[0]
    assert (out.n_above, out.n_below, out.runs) == (1, 1, 2)
    assert out.z_e6 is None


def test_runs_test_groups_isolated(spark):
    from legendary_data_pipeline_spark.operators.hypotests import runs_test

    rows = [("a", t, v) for t, v in enumerate([5, 1, 6, 2, 7, 3])] + [
        ("b", t, v) for t, v in enumerate([1, 2, 3, 4, 5, 6])
    ]
    out = {
        r.g: r
        for r in runs_test(
            _series(spark, rows), "t", "v", group_cols=["g"]
        ).collect()
    }
    assert out["a"].runs == 6 and out["b"].runs == 2


# ---------------------------------------------------------------------------
# Friedman test (X190)
# ---------------------------------------------------------------------------


def _blocks(spark, rows):
    return spark.createDataFrame(rows, "b long, tr string, v long")


def test_friedman_hand_computed_no_ties(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        friedman_test,
    )

    # 3 blocks x 3 treatments, perfectly consistent ranking:
    # classical Q = 12/(3*3*4)*(9+36+81) - 3*3*4 = 6 (= Conover T
    # when tie-free)
    rows = [
        (1, "t1", 1), (1, "t2", 2), (1, "t3", 3),
        (2, "t1", 2), (2, "t2", 4), (2, "t3", 6),
        (3, "t1", 1), (3, "t2", 5), (3, "t3", 9),
    ]
    out = friedman_test(_blocks(spark, rows), "b", "tr", "v").collect()[0]
    assert out.n_blocks == 3 and out.k == 3 and out.n_dropped_blocks == 0
    assert out.t == 6.0


def test_friedman_incomplete_blocks_dropped(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        friedman_test,
    )

    rows = [
        (1, "t1", 1), (1, "t2", 2), (1, "t3", 3),
        (2, "t1", 2), (2, "t2", 4), (2, "t3", 6),
        (9, "t1", 7),  # incomplete block -> dropped, counted
    ]
    out = friedman_test(_blocks(spark, rows), "b", "tr", "v").collect()[0]
    assert out.n_blocks == 2 and out.n_dropped_blocks == 1


def test_friedman_all_tied_null(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        friedman_test,
    )

    rows = [
        (1, "t1", 5), (1, "t2", 5),
        (2, "t1", 7), (2, "t2", 7),
    ]
    out = friedman_test(_blocks(spark, rows), "b", "tr", "v").collect()[0]
    assert out.t is None


def test_friedman_duplicate_cell_raises(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        friedman_test,
    )

    rows = [(1, "t1", 1), (1, "t1", 2), (1, "t2", 3)]
    with pytest.raises(Exception, match="duplicate"):
        friedman_test(_blocks(spark, rows), "b", "tr", "v").collect()


def test_friedman_duplicate_in_incomplete_block_raises(spark):
    """r10 advice regression: the old guard lived on __v, which only
    evaluates for blocks surviving the complete-block filter — a
    duplicate inside an INCOMPLETE block (bk != k) was silently
    swallowed as a dropped block. The guard now folds into the sizes
    aggregation and fires regardless."""
    from legendary_data_pipeline_spark.operators.hypotests import (
        friedman_test,
    )

    rows = [
        # complete block establishes k=3
        (1, "t1", 1), (1, "t2", 2), (1, "t3", 3),
        # incomplete block (missing t3, bk=2 != 3) with a duplicate cell
        (2, "t1", 4), (2, "t1", 5),
    ]
    with pytest.raises(Exception, match="duplicate"):
        friedman_test(_blocks(spark, rows), "b", "tr", "v").collect()


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra (X194)
# ---------------------------------------------------------------------------


def test_jt_hand_computed_no_ties(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        jonckheere_terpstra,
    )

    # G1=[1,2], G2=[3,4]: J = 4 (all cross pairs ascending);
    # E = (16-8)/4 = 2; no ties -> Var = A/72 = 120/72 = 5/3;
    # z = 2/sqrt(5/3)
    rows = [("g1", 1), ("g1", 2), ("g2", 3), ("g2", 4)]
    out = jonckheere_terpstra(_df(spark, rows), "v", "g").collect()[0]
    assert out.n == 4 and out.k == 2
    assert out.j == 4.0
    assert out.z_e6 == round(2.0 / (120.0 / 72.0) ** 0.5 * 1e6)


def test_jt_tie_half_credit_and_corrected_variance(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        jonckheere_terpstra,
    )

    # G1=[1,2], G2=[2,3]: J = 3 + 0.5 = 3.5; E = 2;
    # A = 156 - 36 - 18 = 102, B = 0, C = 4*2 = 8
    # Var = 102/72 + 8/(8*4*3) = 1.5; z = 1.5/sqrt(1.5)
    rows = [("g1", 1), ("g1", 2), ("g2", 2), ("g2", 3)]
    out = jonckheere_terpstra(_df(spark, rows), "v", "g").collect()[0]
    assert out.j == 3.5
    assert out.z_e6 == round(1.5 / 1.5 ** 0.5 * 1e6)


def test_jt_descending_trend_negative(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        jonckheere_terpstra,
    )

    # reverse the trend: J counts ascending-ordered pairs -> 0, z < 0
    rows = [("g1", 3), ("g1", 4), ("g2", 1), ("g2", 2)]
    out = jonckheere_terpstra(_df(spark, rows), "v", "g").collect()[0]
    assert out.j == 0.0 and out.z_e6 < 0


def test_jt_three_group_monotone(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        jonckheere_terpstra,
    )

    # perfectly separated ascending groups: J = sum of all cross-pair
    # counts = 4+4+4 = 12 with n_i = 2 each
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5), ("c", 6)]
    out = jonckheere_terpstra(_df(spark, rows), "v", "g").collect()[0]
    assert out.k == 3 and out.j == 12.0 and out.z_e6 > 0


def test_jt_degenerate(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        jonckheere_terpstra,
    )

    # single group -> NULL z; all values tied everywhere -> Var > 0
    # still (group-size terms) but J = half credit only
    one = jonckheere_terpstra(
        _df(spark, [("a", 1), ("a", 2)]), "v", "g"
    ).collect()[0]
    assert one.k == 1 and one.z_e6 is None
    tied = jonckheere_terpstra(
        _df(spark, [("a", 5), ("a", 5), ("b", 5), ("b", 5)]), "v", "g"
    ).collect()[0]
    # every cross pair tied: J = 4*0.5 = 2 = E -> z = 0 unless Var = 0
    assert tied.j == 2.0


# ---------------------------------------------------------------------------
# Cohen's d (X199)
# ---------------------------------------------------------------------------


def test_cohens_d_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.hypotests import cohens_d

    # the welch test data: a=[1,2,3,4] (mean 2.5, s^2 5/3),
    # b=[2,4,6,8,10] (mean 6, s^2 10); s_p = sqrt(45/7);
    # d = -3.5/s_p; g = d * (1 - 3/(4*9-9))
    rows = [("a", 1), ("a", 2), ("a", 3), ("a", 4)] + [
        ("b", v) for v in (2, 4, 6, 8, 10)
    ]
    out = cohens_d(_df(spark, rows), "v", "g", "a", "b").collect()[0]
    sp = (45.0 / 7.0) ** 0.5
    d = -3.5 / sp
    g = d * (1.0 - 3.0 / 27.0)
    assert out.mean_a == 2.5 and out.mean_b == 6.0
    assert out.d_e6 == round(d * 1e6)
    assert out.g_e6 == round(g * 1e6)


def test_cohens_d_degenerate_and_guard(spark):
    from legendary_data_pipeline_spark.operators.hypotests import cohens_d

    # single-point group -> NULL d/g; zero pooled variance -> NULL;
    # equal labels raise
    one = cohens_d(
        _df(spark, [("a", 3), ("b", 1), ("b", 2)]), "v", "g", "a", "b"
    ).collect()[0]
    assert one.d_e6 is None
    flat = cohens_d(
        _df(spark, [("a", 5), ("a", 5), ("b", 7), ("b", 7)]),
        "v", "g", "a", "b",
    ).collect()[0]
    assert flat.d_e6 is None
    with pytest.raises(ValueError, match="must differ"):
        cohens_d(_df(spark, [("a", 1)]), "v", "g", "a", "a")


# ---------------------------------------------------------------------------
# Mood's median test (X201)
# ---------------------------------------------------------------------------


def test_moods_median_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        moods_median_test,
    )

    # pooled [1..8], median 4.5; a=[1,2,3,4] all below, b=[5,6,7,8]
    # all above -> 2x2 table (0,4 / 4,0), margins 4/4, e = 2 each
    # chi2 = 4 * (2^2/2) = 8
    rows = [("a", v) for v in (1, 2, 3, 4)] + [
        ("b", v) for v in (5, 6, 7, 8)
    ]
    out = moods_median_test(_df(spark, rows), "v", "g").collect()[0]
    assert (out.n, out.k, out.dof) == (8, 2, 1)
    assert (out.n_above, out.n_below) == (4, 4)
    assert out.chi2_e6 == 8_000_000


def test_moods_median_ties_below_and_degenerate(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        moods_median_test,
    )

    # values equal to the median count BELOW: [1,2,2,3] median 2 ->
    # above = {3}, below = {1,2,2}
    rows = [("a", 1), ("a", 2), ("b", 2), ("b", 3)]
    out = moods_median_test(_df(spark, rows), "v", "g").collect()[0]
    assert out.n_above == 1 and out.n_below == 3
    # all values identical -> everything below -> NULL chi2
    flat = moods_median_test(
        _df(spark, [("a", 5), ("b", 5)]), "v", "g"
    ).collect()[0]
    assert flat.chi2_e6 is None
