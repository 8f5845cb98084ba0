"""Unit contracts for the classifier-evaluation operators (mleval.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.mleval import (
    auc_by_group,
    calibration_bins,
    pr_at_thresholds,
    stratified_split_exact,
)


def _auc_reference(scores, labels):
    """Tie-corrected AUC by direct pair counting (O(n^2) reference)."""
    pairs = wins = 0
    for si, li in zip(scores, labels):
        for sj, lj in zip(scores, labels):
            if li == 1 and lj == 0:
                pairs += 1
                if si > sj:
                    wins += 1
                elif si == sj:
                    wins += 0.5
    return wins / pairs if pairs else None


@pytest.fixture()
def scored(spark):
    rows = [
        # group g1: separable-ish with ties
        ("g1", 0.9, 1), ("g1", 0.8, 1), ("g1", 0.8, 0), ("g1", 0.4, 0),
        ("g1", 0.4, 1), ("g1", 0.1, 0), ("g1", 0.1, 0), ("g1", 0.95, 1),
        # group g2: anti-correlated
        ("g2", 0.1, 1), ("g2", 0.2, 1), ("g2", 0.8, 0), ("g2", 0.9, 0),
        # group g3: degenerate (all positive)
        ("g3", 0.5, 1), ("g3", 0.6, 1),
    ]
    return spark.createDataFrame(rows, "g string, score double, lab int")


def test_auc_matches_pair_counting_reference(scored):
    out = {
        r["g"]: r
        for r in auc_by_group(scored, ["g"], "score", "lab").collect()
    }
    rows = scored.collect()
    for g in ("g1", "g2"):
        sub = [(r["score"], r["lab"]) for r in rows if r["g"] == g]
        ref = _auc_reference([s for s, _ in sub], [l for _, l in sub])
        assert out[g]["auc"] == pytest.approx(ref, abs=1e-6), g
    assert out["g2"]["auc"] < 0.5 < out["g1"]["auc"]


def test_auc_degenerate_group_is_null(scored):
    out = {r["g"]: r for r in auc_by_group(scored, ["g"], "score", "lab").collect()}
    assert out["g3"]["auc"] is None
    assert out["g3"]["n_neg"] == 0


def test_calibration_bins_partition_rows(spark):
    df = spark.range(100).select(
        (F.col("id").cast("double") / 99.0).alias("pred"),
        (F.col("id") % 3 == 0).cast("int").alias("lab"),
    )
    out = calibration_bins(df, "pred", "lab", n_bins=10).collect()
    assert sum(r["n"] for r in out) == 100
    by_bin = {r["bin"]: r for r in out}
    # pred == 1.0 lands in the top bin, not bin 10
    assert max(by_bin) == 9
    for r in out:
        assert 0 <= r["frac_pos"] <= 1
        assert r["bin_mid"] == pytest.approx((r["bin"] + 0.5) / 10)


def test_pr_threshold_sweep_monotone_recall(spark):
    df = spark.range(200).select(
        (F.col("id").cast("double") / 199.0).alias("pred"),
        (F.col("id") >= 100).cast("int").alias("lab"),
    )
    grid = [0.1, 0.3, 0.5, 0.7, 0.9]
    out = sorted(
        pr_at_thresholds(df, "pred", "lab", grid).collect(),
        key=lambda r: r["threshold"],
    )
    recalls = [r["recall"] for r in out]
    assert recalls == sorted(recalls, reverse=True)
    # counts are complete: tp + fn == total positives at every threshold
    for r in out:
        assert r["tp"] + r["fn"] == 100
    # perfectly separable at 0.5: precision 1.0
    mid = next(r for r in out if r["threshold"] == 0.5)
    assert mid["precision"] == 1.0 and mid["recall"] == 1.0


def test_stratified_split_exact_proportions(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("stratum")
    )
    out = stratified_split_exact(df, ["stratum"], "id", train_pct=80, seed=3)
    counts = (
        out.groupBy("stratum", "split").count().collect()
    )
    per = {}
    for r in counts:
        per.setdefault(r["stratum"], {})[r["split"]] = r["count"]
    for stratum, d in per.items():
        n = d.get("train", 0) + d.get("val", 0)
        assert d.get("train", 0) == int(n * 80 / 100), stratum


def test_stratified_split_deterministic(spark):
    df = spark.range(100).select(F.col("id"), F.lit("s").alias("stratum"))
    a = set(
        (r["id"], r["split"])
        for r in stratified_split_exact(df, ["stratum"], "id", 80, seed=9).collect()
    )
    b = set(
        (r["id"], r["split"])
        for r in stratified_split_exact(df, ["stratum"], "id", 80, seed=9).collect()
    )
    assert a == b
    c = set(
        (r["id"], r["split"])
        for r in stratified_split_exact(df, ["stratum"], "id", 80, seed=10).collect()
    )
    assert a != c  # seed changes the draw


def test_empty_inputs(spark):
    empty = spark.createDataFrame([], "g string, score double, lab int")
    assert auc_by_group(empty, ["g"], "score", "lab").count() == 0
    assert calibration_bins(empty, "score", "lab").count() == 0
    out = pr_at_thresholds(empty, "score", "lab", [0.5])
    assert out.count() == 0
    assert stratified_split_exact(empty, ["g"], "score").count() == 0
