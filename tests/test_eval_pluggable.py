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
