"""Distributed classifier/ranker evaluation primitives.

A training-data pipeline that runs quality classifiers (the engine's
NB quality scorer, X95) and samplers needs to EVALUATE them at corpus
scale: ROC-AUC, calibration, precision/recall at operating thresholds,
and leak-free stratified splits. Everything here is exact and
integer-deterministic so every operator is DuckDB-oracle-checkable
(division happens once, at the end, on exact integer counts).

Scale notes (100 TB):

- ``auc_by_group`` never sorts globally: scores are first reduced to
  one row per (group, distinct score) — a normal shuffled aggregation
  with map-side combine — and the rank-statistic cumulative sum runs in
  a window partitioned BY GROUP. The tie-corrected Mann-Whitney
  numerator is kept in integer space (doubled to avoid the n/2 halves).
  For a single gigantic group, pre-bucket scores (the engine's bucketed
  two-phase global-rank pattern, operators/ranking.py) before the sweep.
- ``calibration_bins`` / ``pr_at_thresholds`` are one map-side-combined
  aggregation each; the threshold grid is a broadcast literal relation.
- ``stratified_split_exact`` ranks within each stratum by a seeded md5
  (portable across engines, functions/hashing.py) — exact per-stratum
  proportions. The window partitions by stratum; for strata too large
  to window, the documented scale fallback is the hash-threshold split
  (operators/curation.py stratified sampler) which is proportional in
  expectation without any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.functions.hashing import seeded_md5_long

__all__ = [
    "auc_by_group",
    "calibration_bins",
    "pr_at_thresholds",
    "stratified_split_exact",
]


def auc_by_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC per group (Mann-Whitney U form).

    ``label_col`` must be 0/1. For each group:

        AUC = [ sum_over_distinct_scores( pos_s * cumneg_below_s )
                + sum( pos_s * neg_s ) / 2 ] / (P * N)

    computed as ``num2 / (2*P*N)`` with ``num2`` fully integer, so the
    only floating-point step is the final division — bit-identical
    across engines. Groups with no positives or no negatives return
    NULL auc (undefined).

    Output: group_cols..., n_pos, n_neg, auc (round 6).
    """
    lab = F.col(label_col).cast("long")
    per_score = df.groupBy(*group_cols, score_col).agg(
        F.sum(lab).alias("__pos"),
        F.sum(F.lit(1) - lab).alias("__neg"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(score_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cumneg = F.coalesce(F.sum("__neg").over(w), F.lit(0))
    contrib = per_score.withColumn(
        "__num2",
        F.lit(2) * F.col("__pos") * cumneg + F.col("__pos") * F.col("__neg"),
    )
    agg = contrib.groupBy(*group_cols).agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.sum("__num2").alias("__num2"),
    )
    denom = F.lit(2) * F.col("n_pos") * F.col("n_neg")
    auc = F.when(
        denom > 0,
        F.round(F.col("__num2").cast("double") / denom.cast("double"), 6),
    )
    return agg.select(*group_cols, "n_pos", "n_neg", auc.alias("auc"))


def calibration_bins(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram counts: equal-width bins over pred in [0, 1].

    bin = min(floor(pred * n_bins), n_bins - 1); output per non-empty
    bin: bin id, bin midpoint, n, n_pos, frac_pos (round 6). All counts
    integer; the midpoint and the final ratio are the only floats.
    """
    lab = F.col(label_col).cast("long")
    bin_id = F.least(
        F.floor(F.col(pred_col) * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    out = (
        df.select(bin_id.alias("bin"), lab.alias("__lab"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__lab").cast("long").alias("n_pos"),
        )
    )
    mid = (F.col("bin").cast("double") + F.lit(0.5)) / F.lit(float(n_bins))
    frac = F.round(
        F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
    )
    return out.select(
        "bin", mid.alias("bin_mid"), "n", "n_pos", frac.alias("frac_pos")
    )


def pr_at_thresholds(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Precision / recall / F1 at a fixed threshold grid.

    The grid is a broadcast literal relation crossed with the scored
    rows; the groupBy(threshold) aggregation map-side combines to
    ``len(thresholds)`` rows per partition, so the join adds no real
    shuffle volume. TP/FP/FN are exact integers; the three ratios are
    final-division-only (round 6). Empty-denominator cells are NULL.
    """
    spark = SparkSession.getActiveSession()
    grid = spark.createDataFrame(
        [(float(t),) for t in sorted(thresholds)], "threshold double"
    )
    lab = F.col(label_col).cast("long")
    pred_pos = (F.col(pred_col) >= F.col("threshold")).cast("long")
    scored = df.select(F.col(pred_col), lab.alias("__lab")).crossJoin(
        F.broadcast(grid)
    )
    agg = scored.groupBy("threshold").agg(
        F.sum(F.col("__lab") * pred_pos).cast("long").alias("tp"),
        F.sum((F.lit(1) - F.col("__lab")) * pred_pos).cast("long").alias("fp"),
        F.sum(F.col("__lab") * (F.lit(1) - pred_pos)).cast("long").alias("fn"),
    )
    prec_den = (F.col("tp") + F.col("fp")).cast("double")
    rec_den = (F.col("tp") + F.col("fn")).cast("double")
    f1_den = (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den, 6)
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        ratio(F.col("tp"), prec_den).alias("precision"),
        ratio(F.col("tp"), rec_den).alias("recall"),
        ratio(F.lit(2) * F.col("tp"), f1_den).alias("f1"),
    )


def stratified_split_exact(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    train_pct: int = 80,
    seed: int = 42,
) -> DataFrame:
    """Exact-proportion stratified train/val split.

    Within each stratum, rows are ranked by a seeded md5 of the id
    (portable, engine-independent pseudo-randomness) and the first
    ``floor(n * train_pct / 100)`` become 'train'. Unlike a plain hash
    threshold, every stratum hits its target fraction EXACTLY (off by
    at most the floor), which matters for small or skewed strata.

    Adds a ``split`` column. The window partitions by stratum — fine up
    to strata of ~10^8 rows; beyond that use the hash-threshold
    stratified sampler (operators/curation.py) which needs no window.
    """
    h = seeded_md5_long(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    wn = Window.partitionBy(*strata_cols)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    cut = F.floor(n * train_pct / F.lit(100)).cast("long")
    split = F.when(rn <= cut, F.lit("train")).otherwise(F.lit("val"))
    return df.withColumn("split", split)
