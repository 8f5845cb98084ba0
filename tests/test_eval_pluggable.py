"""The retrieval-eval metrics are pluggable: the same MRR operator runs
over the exact brute-force ranking AND the IVF shortlist, and the IVF
number lands near the exact one — the documented scale path for
`ret_mrr_at_10`/`ret_ndcg_at_10` (whose registry form uses the exact
quadratic ranking only because it is fully oracle-able)."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.catalog import load_distributed
from legendary_data_pipeline_spark.operators import similarity as S
from legendary_data_pipeline_spark.operators.mleval import mrr_at_k

K = 10


def _qf():
    return F.col("vec_id") % 5 == 0


def _with_rel(ranked, emb):
    q_lab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    n_lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    return (
        ranked.join(q_lab, "query_id")
        .join(n_lab, "neighbor_id")
        .select(
            "query_id",
            "rank",
            (F.col("q_label") == F.col("n_label")).cast("int").alias("rel"),
        )
    )


def test_mrr_over_ivf_shortlist_tracks_exact(spark, sf_dir):
    emb = load_distributed(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, k=K, query_filter=_qf(), block_on_label=False)
    ivf = S.ivf_topk(
        emb, n_centroids=16, n_probe=8, k=K, query_filter=_qf()
    )
    m_exact = mrr_at_k(
        _with_rel(exact, emb), "query_id", "rank", "rel", k=K
    ).collect()[0]
    m_ivf = mrr_at_k(
        _with_rel(ivf, emb), "query_id", "rank", "rel", k=K
    ).collect()[0]
    assert m_exact["mrr"] > 0
    # shortlist eval must track the exact eval closely at this n_probe
    assert m_ivf["mrr"] >= 0.8 * m_exact["mrr"], (
        m_ivf["mrr"],
        m_exact["mrr"],
    )
    assert m_ivf["n_queries"] == m_exact["n_queries"]


# ---------------------------------------------------------------------------
# precision/recall@k (X207)
# ---------------------------------------------------------------------------


def test_precision_recall_at_k_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.mleval import (
        precision_recall_at_k,
    )

    # q1: hits at ranks 1,3 within k=3 (2 hits of 4 relevant);
    # q2: no hits in top 3 (0 of 2 relevant)
    ranked = spark.createDataFrame(
        [
            (1, 1, 1), (1, 2, 0), (1, 3, 1), (1, 4, 1),
            (2, 1, 0), (2, 2, 0), (2, 3, 0), (2, 4, 1),
        ],
        "q long, rank long, rel int",
    )
    total = spark.createDataFrame([(1, 4), (2, 2)], "q long, n_rel long")
    out = precision_recall_at_k(
        ranked, "q", "rank", "rel", k=3, total_rel=total
    ).collect()[0]
    assert out.n_queries == 2 and out.n_hits == 2 and out.n_rel_total == 6
    assert out.precision_at_k == 2.0 / 6.0  # 2 hits / (k=3 * 2 queries)
    assert out.recall_at_k == 2.0 / 6.0  # micro: 2 / (4+2)


def test_precision_recall_zero_hit_query_counted(spark):
    from legendary_data_pipeline_spark.operators.mleval import (
        precision_recall_at_k,
    )

    # a query present only in total_rel (no ranked rows) still counts
    ranked = spark.createDataFrame(
        [(1, 1, 1)], "q long, rank long, rel int"
    )
    total = spark.createDataFrame([(1, 1), (9, 5)], "q long, n_rel long")
    out = precision_recall_at_k(
        ranked, "q", "rank", "rel", k=2, total_rel=total
    ).collect()[0]
    assert out.n_queries == 2
    assert out.recall_at_k == 1.0 / 6.0
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        precision_recall_at_k(ranked, "q", "rank", "rel", k=0)


# ---------------------------------------------------------------------------
# expected calibration error (X210)
# ---------------------------------------------------------------------------


def test_ece_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.mleval import (
        expected_calibration_error,
    )

    # two bins: preds 0.1 (x4, 1 positive -> acc .25, conf .1, gap .15)
    # and 0.9 (x4, 2 positives -> acc .5, conf .9, gap .4)
    # ECE = (4*.15 + 4*.4)/8 = 0.275; MCE = 0.4
    rows = [(0.1, 1), (0.1, 0), (0.1, 0), (0.1, 0),
            (0.9, 1), (0.9, 1), (0.9, 0), (0.9, 0)]
    df = spark.createDataFrame(rows, "pred double, lab int")
    out = expected_calibration_error(df, "pred", "lab", n_bins=10).collect()[0]
    assert out.n == 8 and out.n_bins_used == 2
    assert out.ece_e6 == 275_000
    assert out.mce_e6 == 400_000


def test_ece_perfect_calibration_zero(spark):
    from legendary_data_pipeline_spark.operators.mleval import (
        expected_calibration_error,
    )

    # bin acc == bin mean confidence exactly -> ECE = MCE = 0
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)]
    df = spark.createDataFrame(rows, "pred double, lab int")
    out = expected_calibration_error(df, "pred", "lab").collect()[0]
    assert out.ece_e6 == 0 and out.mce_e6 == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="n_bins"):
        expected_calibration_error(df, "pred", "lab", n_bins=0)


def test_precision_recall_uncovered_ranked_query_raises(spark):
    """Round-10 review regression: a ranked query missing from
    total_rel used to coalesce n_rel to 0, inflating micro recall
    (possible > 1.0); it now raises in-plan."""
    import pytest as _pt

    from legendary_data_pipeline_spark.operators.mleval import (
        precision_recall_at_k,
    )

    ranked = spark.createDataFrame(
        [(3, 1, 1)], "q long, rank long, rel int"
    )
    total = spark.createDataFrame([(9, 1)], "q long, n_rel long")
    with _pt.raises(Exception, match="no total_rel row"):
        precision_recall_at_k(
            ranked, "q", "rank", "rel", k=2, total_rel=total
        ).collect()
