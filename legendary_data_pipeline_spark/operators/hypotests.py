"""Classical hypothesis tests over warehouse columns — the "did this
slice really move?" family that sits between the engine's drift
detectors (PSI/KS/chi², operators/profiling.py + stats.py) and its
causal readouts (two-proportion z, DiD):

- `mann_whitney_u`: two-sample rank-sum test (tie-corrected normal
  approximation) — the nonparametric "are these two distributions
  shifted?" check that needs no normality assumption. The rank-sum
  U statistic is the unnormalized twin of the engine's exact AUC
  (operators/mleval.py): U / (n_a·n_b) IS the AUC.
- `kruskal_wallis`: k-group rank ANOVA (tie-corrected H) — "does this
  metric differ across sources/segments at all?" before pairwise digs.
- `welch_t_test`: unequal-variance two-sample t with Welch–
  Satterthwaite dof — the parametric companion when means are the
  question and group variances differ (they always do).
- `anova_oneway`: one-way fixed-effects F + eta² effect size across k
  groups — the "which dimension explains this metric" screen.

No reference analogue (the reference computes rollups, not inference);
these extend SURVEY §2.11's statistics family (X118-X120, X152,
X157, X160, X165) with the standard two-sample/k-sample toolkit a
data-quality gate or experiment readout needs.

Cross-engine determinism (the engine's oracle bar):
- Rank statistics use the DOUBLED-rank construction from
  `spearman_matrix` (stats.py): average rank of value v is
  below(v) + (cnt(v)+1)/2, kept integer as r2(v) = 2·below(v) +
  cnt(v) + 1. Rank sums and tie terms Σ(t³−t) accumulate as
  decimal(38,0) — order-independent, bit-identical on any engine and
  partitioning.
- Moment statistics (t/F) accumulate Σx and Σx² as decimal(38,0) over
  INTEGER-valued inputs (the engine's cents convention — cast your
  measure to integer units first).
- The final statistic is one fixed IEEE double expression tree over
  those exact integers. Per-GROUP double terms (Kruskal's Σ R_g²/n_g,
  ANOVA's Σ S_g²/n_g) are group-cardinality-many, magnitudes
  comparable — the chi²/mutual-information precedent — and every
  fractional output leaves as a micro-scaled integer (`*_e6` BIGINT):
  scale-0 rounding is nearest-integer in every engine build, so a
  1-ulp libm/summation difference cannot move the emitted value
  (the round-9 `st_kendall_tau_qty_discount` lesson).

Scale notes (100 TB):
- `mann_whitney_u` / `kruskal_wallis`: ONE map-side-combinable groupBy
  compresses the data to the distinct-value frame; below-counts come
  from `distributed_below_counts` (stats.py — one range shuffle,
  per-partition windows, P-row offsets broadcast), so a continuous
  measure whose distinct frame approaches the data size never funnels
  through a single partition. One final 1-row (or k-row) aggregation.
- `welch_t_test` / `anova_oneway`: one partial-aggregable groupBy to
  k rows of exact moments — no second scan, no shuffle wider than the
  moment vector.
- Variance/H magnitudes: tie sums Σ(t³−t) ≤ n³ and moment products
  n·Σx² stay inside decimal(38,0) through n ≈ 10^9 rows per test cell
  with 9-digit integer measures; beyond that, pre-bucket the measure
  (the X102 fixed-grid convention) — the test is rank/moment-based
  and survives coarsening.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.stats import (
    distributed_below_counts,
)

_DEC = "decimal(38,0)"


def _e6(col: Column) -> Column:
    """round(x·1e6) BIGINT — the engine's canonical fractional output."""
    return F.round(col.cast("double") * F.lit(1e6)).cast("long")


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) test between two
    named groups, tie-corrected normal approximation.

        U_a = #{(x ∈ a, y ∈ b): x > y} + ½·#{x = y}
        z = (U_a − n_a·n_b/2) / sqrt(Var),
        Var = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n·(n−1)))

    ``value_col`` must be integer-valued (cents convention — cast
    first). Rows outside the two named groups and NULL values drop.

    Everything up to the final z is exact: per-distinct-value group
    counts, strictly-below counts from the distributed prefix sum, and
    the doubled statistic U2 = 2·U_a = Σ_v n_av·(2·below_b(v) + n_bv)
    accumulating as decimal(38,0). u1 = U2/2 is one exact binary
    halving; z is one fixed IEEE tree; z_e6 leaves as BIGINT.

    Degenerate inputs (either group empty, all values tied → Var 0)
    yield NULL z_e6. Output (1 row): n_a, n_b, u1, auc_ab, z_e6 —
    auc_ab = U_a/(n_a·n_b) = P(a > b) + ½P(a = b), the effect size
    (exactly the engine's AUC when a = positives, value = score).
    """
    if group_a == group_b:
        # With equal labels every row lands in BOTH groups (n_a = n_b
        # = N) while the pooled tie count __c counts rows once — the
        # tie-corrected variance then mixes inconsistent n's and emits
        # a silently meaningless z_e6. Fail loudly instead.
        raise ValueError(
            f"mann_whitney_u: group_a and group_b must differ "
            f"(both = {group_a!r})"
        )
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    is_a = g.eqNullSafe(F.lit(group_a))
    is_b = g.eqNullSafe(F.lit(group_b))
    d = df.select(
        v.alias("__v"),
        is_a.cast("long").alias("__ia"),
        is_b.cast("long").alias("__ib"),
    ).where(v.isNotNull() & (F.col("__ia") + F.col("__ib") > 0))
    per_v = d.groupBy("__v").agg(
        F.sum("__ia").cast(_DEC).alias("__na"),
        F.sum("__ib").cast(_DEC).alias("__nb"),
        F.count(F.lit(1)).cast(_DEC).alias("__c"),
    )
    cum = distributed_below_counts(per_v, "__v", ["__nb"], inclusive=False)
    agg = cum.agg(
        F.sum("__na").cast(_DEC).alias("__n_a"),
        F.sum("__nb").cast(_DEC).alias("__n_b"),
        F.sum(
            (
                F.col("__na")
                * (F.lit(2).cast(_DEC) * F.col("__nb_cum") + F.col("__nb"))
            ).cast(_DEC)
        ).cast(_DEC).alias("__u2"),
        F.sum(
            (F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c")).cast(
                _DEC
            )
        ).cast(_DEC).alias("__tie"),
    )
    nad = F.col("__n_a").cast("double")
    nbd = F.col("__n_b").cast("double")
    nd = nad + nbd
    u2d = F.col("__u2").cast("double")
    tied = F.col("__tie").cast("double")
    var = (nad * nbd / F.lit(12.0)) * (
        (nd + F.lit(1.0)) - tied / (nd * (nd - F.lit(1.0)))
    )
    z = (u2d - nad * nbd) / (F.lit(2.0) * F.sqrt(var))
    return agg.select(
        F.coalesce(F.col("__n_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("__n_b"), F.lit(0)).cast("long").alias("n_b"),
        (u2d / F.lit(2.0)).alias("u1"),
        F.when(
            (F.col("__n_a") > 0) & (F.col("__n_b") > 0),
            u2d / (F.lit(2.0) * (nad * nbd)),
        ).alias("auc_ab"),
        F.when(
            (F.col("__n_a") > 0) & (F.col("__n_b") > 0) & (var > 0),
            _e6(z),
        ).alias("z_e6"),
    )


def kruskal_wallis(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Kruskal–Wallis rank ANOVA across ALL observed groups —
    tie-corrected H with k−1 dof.

        H = 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)
        H_c = H / (1 − Σ(t³−t)/(n³−n))

    ``value_col`` must be integer-valued. NULL values or group keys
    drop. Rank sums stay exact via doubled average ranks
    (r2(v) = 2·below(v) + cnt(v) + 1, the `spearman_matrix`
    construction): 2·R_g = Σ_v n_gv·r2(v) in decimal(38,0), so
    R_g²/n_g = (2R_g)²/(4·n_g). The per-group double terms sum under
    the chi² precedent; H leaves as h_e6 BIGINT.

    Degenerate inputs (k < 2, or every value identical → tie factor 0)
    yield NULL h_e6. Output (1 row): n, n_groups, dof, h_e6.

    Scale: one (group, value) groupBy + one value groupBy (both
    map-side combinable, distinct-frame-sized), distributed below-
    counts, one value-keyed join, then a k-row aggregation.
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    d = df.select(g.alias("__g"), v.alias("__v")).where(
        v.isNotNull() & g.isNotNull()
    )
    # Pin: the pooled-value frame and the per-(group, value) frame are
    # two consumers of the same projection — one materialization, not
    # two corpus scans (the round-9 multi-consumer rule).
    d = d.localCheckpoint(eager=False)
    pooled = d.groupBy("__v").agg(F.count(F.lit(1)).cast(_DEC).alias("__c"))
    cum = distributed_below_counts(pooled, "__v", ["__c"], inclusive=False)
    rankmap = cum.select(
        "__v",
        (
            F.lit(2).cast(_DEC) * F.col("__c_cum")
            + F.col("__c")
            + F.lit(1).cast(_DEC)
        ).cast(_DEC).alias("__r2"),
        (
            (F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c")).cast(
                _DEC
            )
        ).alias("__t3"),
    )
    per_gv = d.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast(_DEC).alias("__ngv")
    )
    joined = per_gv.join(rankmap, "__v")
    per_g = joined.groupBy("__g").agg(
        F.sum("__ngv").cast(_DEC).alias("__ng"),
        F.sum((F.col("__ngv") * F.col("__r2")).cast(_DEC))
        .cast(_DEC)
        .alias("__r2g"),
    )
    # Σ(t³−t) comes from the pooled frame (each distinct value once —
    # summing __t3 over the joined frame would count a value once per
    # group that observes it).
    tie = rankmap.agg(F.sum("__t3").cast(_DEC).alias("__tie"))
    r2gd = F.col("__r2g").cast("double")
    ngd = F.col("__ng").cast("double")
    stats = per_g.agg(
        F.sum("__ng").cast(_DEC).alias("__n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((r2gd * r2gd) / (F.lit(4.0) * ngd)).alias("__sumrr"),
    ).crossJoin(F.broadcast(tie))
    nd = F.col("__n").cast("double")
    h = (F.lit(12.0) / (nd * (nd + F.lit(1.0)))) * F.col("__sumrr") - F.lit(
        3.0
    ) * (nd + F.lit(1.0))
    tie_factor = F.lit(1.0) - F.col("__tie").cast("double") / (
        nd * nd * nd - nd
    )
    return stats.select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n"),
        "n_groups",
        F.when(
            F.col("n_groups") > 0, F.col("n_groups") - F.lit(1)
        ).cast("long").alias("dof"),
        F.when(
            (F.col("n_groups") >= 2) & (tie_factor > 0),
            _e6(h / tie_factor),
        ).alias("h_e6"),
    )


def welch_t_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between two named
    groups, with Welch–Satterthwaite degrees of freedom.

        t = (m_a − m_b) / sqrt(s_a²/n_a + s_b²/n_b)
        dof = (s_a²/n_a + s_b²/n_b)² /
              ((s_a²/n_a)²/(n_a−1) + (s_b²/n_b)²/(n_b−1))

    ``value_col`` must be integer-valued (cents). ONE filtered
    aggregation yields exact decimal(38,0) n/Σx/Σx² per group; sample
    variance uses the exact-numerator identity
    s² = (n·Σx² − (Σx)²)/(n·(n−1)) so no float accumulates. Means are
    exact IEEE ratios (emitted raw); t and dof leave as *_e6 BIGINT.

    Degenerate inputs (a group with n < 2, both variances 0) yield
    NULL t_e6/dof_e6. Output (1 row): n_a, n_b, mean_a, mean_b, t_e6,
    dof_e6.
    """
    if group_a == group_b:
        # Same failure class as mann_whitney_u: equal labels put every
        # row in both sides and the statistic silently compares a
        # sample with itself.
        raise ValueError(
            f"welch_t_test: group_a and group_b must differ "
            f"(both = {group_a!r})"
        )
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    is_a = g.eqNullSafe(F.lit(group_a))
    is_b = g.eqNullSafe(F.lit(group_b))
    d = df.select(
        v.cast(_DEC).alias("__v"),
        is_a.alias("__ia"),
        is_b.alias("__ib"),
    ).where(v.isNotNull() & (F.col("__ia") | F.col("__ib")))

    def side(flag: str, suffix: str) -> list[Column]:
        m = F.col(flag)
        return [
            F.coalesce(F.sum(m.cast("long")), F.lit(0))
            .cast(_DEC)
            .alias(f"__n{suffix}"),
            F.coalesce(F.sum(F.when(m, F.col("__v"))), F.lit(0))
            .cast(_DEC)
            .alias(f"__s{suffix}"),
            F.coalesce(
                F.sum(F.when(m, (F.col("__v") * F.col("__v")).cast(_DEC))),
                F.lit(0),
            )
            .cast(_DEC)
            .alias(f"__q{suffix}"),
        ]

    agg = d.agg(*side("__ia", "a"), *side("__ib", "b"))

    def var_d(suffix: str) -> Column:
        n = F.col(f"__n{suffix}")
        s = F.col(f"__s{suffix}")
        q = F.col(f"__q{suffix}")
        num = (n * q - s * s).cast(_DEC).cast("double")
        nd = n.cast("double")
        return num / (nd * (nd - F.lit(1.0)))

    nad = F.col("__na").cast("double")
    nbd = F.col("__nb").cast("double")
    mean_a = F.col("__sa").cast("double") / nad
    mean_b = F.col("__sb").cast("double") / nbd
    wa = var_d("a") / nad
    wb = var_d("b") / nbd
    se2 = wa + wb
    t = (mean_a - mean_b) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (wa * wa) / (nad - F.lit(1.0)) + (wb * wb) / (nbd - F.lit(1.0))
    )
    ok = (F.col("__na") >= 2) & (F.col("__nb") >= 2)
    return agg.select(
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        F.when(F.col("__na") > 0, mean_a).alias("mean_a"),
        F.when(F.col("__nb") > 0, mean_b).alias("mean_b"),
        F.when(ok & (se2 > 0), _e6(t)).alias("t_e6"),
        F.when(ok & (se2 > 0), _e6(dof)).alias("dof_e6"),
    )


def anova_oneway(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """One-way fixed-effects ANOVA across ALL observed groups: F
    statistic plus eta² effect size (SSB/SST).

        SSB = Σ_g S_g²/n_g − S²/N      SSW = Q − Σ_g S_g²/n_g
        F = (SSB/(k−1)) / (SSW/(N−k))

    ``value_col`` must be integer-valued. One map-side-combinable
    groupBy yields exact decimal(38,0) (n_g, S_g, Q_g) per group; the
    k per-group S_g²/n_g doubles sum under the chi² precedent; F and
    eta² leave as *_e6 BIGINT.

    Degenerate inputs (k < 2, N ≤ k, SSW = 0) yield NULL f_e6 (eta²
    still emitted when SST > 0). Output (1 row): n, n_groups,
    dof_between, dof_within, f_e6, eta_sq_e6.
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    d = df.select(g.alias("__g"), v.cast(_DEC).alias("__v")).where(
        v.isNotNull() & g.isNotNull()
    )
    per_g = d.groupBy("__g").agg(
        F.count(F.lit(1)).cast(_DEC).alias("__ng"),
        F.sum("__v").cast(_DEC).alias("__sg"),
        F.sum((F.col("__v") * F.col("__v")).cast(_DEC)).cast(_DEC).alias(
            "__qg"
        ),
    )
    sgd = F.col("__sg").cast("double")
    ngd = F.col("__ng").cast("double")
    agg = per_g.agg(
        F.sum("__ng").cast(_DEC).alias("__n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("__sg").cast(_DEC).alias("__s"),
        F.sum("__qg").cast(_DEC).alias("__q"),
        F.sum((sgd * sgd) / ngd).alias("__sumsq_over_n"),
    )
    nd = F.col("__n").cast("double")
    sd = F.col("__s").cast("double")
    qd = F.col("__q").cast("double")
    kd = F.col("n_groups").cast("double")
    ssb = F.col("__sumsq_over_n") - (sd * sd) / nd
    ssw = qd - F.col("__sumsq_over_n")
    sst = qd - (sd * sd) / nd
    f = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    ok = (
        (F.col("n_groups") >= 2)
        & (F.col("__n").cast("long") > F.col("n_groups"))
        & (ssw > 0)
    )
    return agg.select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n"),
        "n_groups",
        F.when(
            F.col("n_groups") > 0, F.col("n_groups") - F.lit(1)
        ).cast("long").alias("dof_between"),
        F.when(
            F.col("n_groups") > 0,
            F.col("__n").cast("long") - F.col("n_groups"),
        ).alias("dof_within"),
        F.when(ok, _e6(f)).alias("f_e6"),
        F.when(sst > 0, _e6(ssb / sst)).alias("eta_sq_e6"),
    )


def mcnemar_test(
    df: DataFrame,
    flag_a: Column,
    flag_b: Column,
    continuity: bool = True,
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes — "do these two
    quality gates / classifiers disagree beyond chance on the same
    documents?" The unpaired two-proportion z-test is wrong here (the
    samples are the same rows); McNemar uses only the discordant
    cells:

        chi2 = (|b − c| − 1)² / (b + c)     (continuity-corrected)

    with b = A-yes/B-no and c = A-no/B-yes counts. ``flag_a`` /
    ``flag_b`` are boolean Columns evaluated per row; rows where
    either is NULL drop (no verdict pair). All four concordance cells
    are exact integers from ONE aggregation; chi2 is a raw IEEE ratio
    of exact integers (representation-proof, no rounding). b + c = 0
    (perfect agreement) yields NULL chi2.

    Output (1 row): n, both_yes, both_no, only_a, only_b, chi2.
    """
    a = flag_a.cast("boolean")
    b = flag_b.cast("boolean")
    d = df.select(a.alias("__a"), b.alias("__b")).where(
        a.isNotNull() & b.isNotNull()
    )

    def cell(pa: bool, pb: bool) -> Column:
        m = (F.col("__a") == pa) & (F.col("__b") == pb)
        return F.coalesce(F.sum(m.cast("long")), F.lit(0)).cast("long")

    agg = d.agg(
        cell(True, True).alias("both_yes"),
        cell(False, False).alias("both_no"),
        cell(True, False).alias("only_a"),
        cell(False, True).alias("only_b"),
    )
    bd = F.col("only_a").cast("double")
    cd = F.col("only_b").cast("double")
    diff = F.abs(bd - cd) - (F.lit(1.0) if continuity else F.lit(0.0))
    # the corrected difference floors at 0 (|b-c| <= 1 means no
    # evidence, not negative evidence)
    diff = F.greatest(diff, F.lit(0.0))
    chi2 = F.when(
        (F.col("only_a") + F.col("only_b")) > 0,
        (diff * diff) / (bd + cd),
    )
    n = (
        F.col("both_yes") + F.col("both_no")
        + F.col("only_a") + F.col("only_b")
    ).cast("long")
    return agg.select(
        n.alias("n"), "both_yes", "both_no", "only_a", "only_b",
        chi2.alias("chi2"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    value_a_col: str,
    value_b_col: str,
) -> DataFrame:
    """Wilcoxon signed-rank test for PAIRED integer measurements —
    "did this entity's metric move between the two conditions?"
    (pre/post per customer, gate-on vs gate-off per document). The
    paired-values companion to `mcnemar_test` (paired flags) and
    `mann_whitney_u` (independent samples).

        d_i = a_i − b_i (zeros drop, the standard convention)
        W+  = Σ ranks of |d_i| where d_i > 0 (average ranks on ties)
        z   = (W+ − n(n+1)/4)
              / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48)

    Rows with a NULL on either side drop. Exactness: |d| ranks use the
    doubled-rank construction over the distinct-|d| frame
    (distributed below-counts — no single-partition stage even when
    differences are near-unique), 2·W+ and the tie sum accumulate as
    decimal(38,0), and z is one fixed IEEE tree emitted as z_e6
    BIGINT. Degenerate inputs (no nonzero differences, zero variance)
    yield NULL z_e6.

    Output (1 row): n_pairs, n_nonzero, w_plus, z_e6.
    """
    a = F.col(value_a_col).cast("long")
    b = F.col(value_b_col).cast("long")
    d = df.select((a - b).alias("__d")).where(
        a.isNotNull() & b.isNotNull()
    )
    # Pin: the total-pairs aggregate and the nonzero pipeline both
    # consume it (round-9 multi-consumer rule).
    d = d.localCheckpoint(eager=False)
    totals = d.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    nz = d.where(F.col("__d") != 0).select(
        F.abs(F.col("__d")).alias("__ad"),
        (F.col("__d") > 0).cast("long").alias("__pos"),
    )
    per_v = nz.groupBy("__ad").agg(
        F.sum("__pos").cast(_DEC).alias("__np"),
        F.count(F.lit(1)).cast(_DEC).alias("__c"),
    )
    cum = distributed_below_counts(per_v, "__ad", ["__c"], inclusive=False)
    # doubled average rank of |d| value v: 2·below + c + 1
    r2 = (
        F.lit(2).cast(_DEC) * F.col("__c_cum")
        + F.col("__c")
        + F.lit(1).cast(_DEC)
    )
    agg = cum.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast(_DEC).alias("__n"),
        F.coalesce(
            F.sum((F.col("__np") * r2).cast(_DEC)), F.lit(0)
        ).cast(_DEC).alias("__w2"),
        F.coalesce(
            F.sum(
                (
                    F.col("__c") * F.col("__c") * F.col("__c")
                    - F.col("__c")
                ).cast(_DEC)
            ),
            F.lit(0),
        ).cast(_DEC).alias("__tie"),
    ).crossJoin(F.broadcast(totals))
    nd = F.col("__n").cast("double")
    w_plus = F.col("__w2").cast("double") / F.lit(2.0)
    mean = nd * (nd + F.lit(1.0)) / F.lit(4.0)
    var = nd * (nd + F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(1.0)) / F.lit(
        24.0
    ) - F.col("__tie").cast("double") / F.lit(48.0)
    z = (w_plus - mean) / F.sqrt(var)
    return agg.select(
        "n_pairs",
        F.col("__n").cast("long").alias("n_nonzero"),
        w_plus.alias("w_plus"),
        F.when((F.col("__n") > 0) & (var > 0), _e6(z)).alias("z_e6"),
    )


def cochrans_q(df: DataFrame, flag_cols: Sequence[str]) -> DataFrame:
    """Cochran's Q test across k ≥ 2 PAIRED binary gates — the k-gate
    generalization of McNemar: "do these quality gates have different
    pass rates on the same documents?"

    With row sums R_i (gates passed per row), column totals C_j, and
    T = ΣC_j:

        Q = (k−1) · Σ_j (k·C_j − T)² / (k · (k·ΣR_i − ΣR_i²))

    (the textbook k(k−1)Σ(C_j − T/k)²/(kΣR − ΣR²) with the fractional
    mean multiplied out — numerator and denominator are EXACT
    decimal(38,0) integers, so Q is one raw IEEE division). Rows where
    any flag is NULL drop (no complete verdict vector). Rows that pass
    all gates or none contribute nothing to the denominator — all-
    concordant input (denominator 0) yields NULL q. dof = k − 1.

    One aggregation (map-side combinable); the per-gate reshape runs
    on the 1-row result. Output: n, k, dof, q.
    """
    k = len(flag_cols)
    if k < 2:
        raise ValueError("cochrans_q needs at least two flag columns")
    flags = [F.col(c).cast("boolean") for c in flag_cols]
    notnull = F.lit(True)
    for f in flags:
        notnull = notnull & f.isNotNull()
    longs = [f.cast("long") for f in flags]
    r = longs[0]
    for x in longs[1:]:
        r = r + x
    d = df.where(notnull).select(
        *[x.alias(f"__f{j}") for j, x in enumerate(longs)],
        r.alias("__r"),
    )
    agg = d.agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        *[
            F.coalesce(F.sum(f"__f{j}"), F.lit(0)).cast(_DEC).alias(f"__c{j}")
            for j in range(k)
        ],
        F.coalesce(F.sum("__r"), F.lit(0)).cast(_DEC).alias("__sr"),
        F.coalesce(
            F.sum((F.col("__r") * F.col("__r")).cast(_DEC)), F.lit(0)
        ).cast(_DEC).alias("__sr2"),
    )
    kd = F.lit(k).cast(_DEC)
    t = None
    for j in range(k):
        t = F.col(f"__c{j}") if t is None else t + F.col(f"__c{j}")
    num = None
    for j in range(k):
        term = (kd * F.col(f"__c{j}") - t).cast(_DEC)
        sq = (term * term).cast(_DEC)
        num = sq if num is None else (num + sq).cast(_DEC)
    den = (kd * (kd * F.col("__sr") - F.col("__sr2"))).cast(_DEC)
    q = (
        F.lit(float(k - 1)) * num.cast("double") / den.cast("double")
    )
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.lit(k - 1).cast("long").alias("dof"),
        F.when(den > 0, q).alias("q"),
    )


def brown_forsythe(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Brown–Forsythe test (Levene's test with the group MEDIAN) for
    variance homogeneity across k groups — the pre-flight check on
    `anova_oneway` (the F test assumes equal variances; this tests
    that assumption robustly, since the median center shrugs off the
    heavy tails warehouse measures always have):

        W = ANOVA-F computed over z_ij = |x_ij − median(group_j)|

    Exactness: medians of integers land on halves, so the spreads are
    DOUBLED into exact integers — z2_ij = |2·x_ij − 2·median_j| — and
    fed through the exact-decimal ANOVA machinery (the F statistic is
    scale-invariant, so doubling changes nothing). Group medians come
    from `percentile` (bit-parity with quantile_cont); everything
    after is the X169 moment path; W leaves as w_e6 BIGINT.

    ``value_col`` must be integer-valued. Output (1 row): n, n_groups,
    dof_between, dof_within, w_e6.

    Scale: one per-group exact percentile (groups are the parallelism
    unit — the winsorize contract), a broadcast medians join, then the
    one-pass ANOVA aggregation.
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    d = df.select(g.alias("__g"), v.alias("__v")).where(
        v.isNotNull() & g.isNotNull()
    ).localCheckpoint(eager=False)  # medians + spreads (r9 rule)
    meds = d.groupBy("__g").agg(
        F.percentile(F.col("__v"), F.lit(0.5)).alias("__med")
    )
    joined = d.join(
        F.broadcast(meds.withColumnRenamed("__g", "__mg")),
        F.col("__g").eqNullSafe(F.col("__mg")),
    )
    # 2·median is integer-valued exactly (median of ints is int or
    # int + 1/2); round() guards the representation, not the value.
    z2 = F.abs(
        F.lit(2) * F.col("__v")
        - F.round(F.col("__med") * F.lit(2.0)).cast("long")
    )
    spreads = joined.select(F.col("__g").alias("g"), z2.alias("z2"))
    out = anova_oneway(spreads, "z2", "g")
    return out.select(
        "n",
        "n_groups",
        "dof_between",
        "dof_within",
        F.col("f_e6").alias("w_e6"),
    )
