"""BM25 lexical retrieval over the document corpus.

Curation pipelines retrieve as much as they filter: finding documents
similar to a quality seed set, near-matches of eval prompts, or
representatives of a topic all start with lexical top-k — and BM25
(Robertson-Spärck Jones) is the standard scorer.

Plan shape (100 TB): term statistics are TWO grouped aggregations over
the exploded corpus (tf per (doc, term), df per term) — both map-side
combinable on uniform term keys. The QUERY side is tiny by contract
(a seed set, not a corpus) and broadcasts into the probe, so the
corpus-sized frames shuffle only on term/doc keys they already
aggregate on; per-query ranking is a WindowGroupLimit top-k. Scores are
rounded before ranking (ties → doc id) so results are engine-stable —
the same contract as the cosine operators, letting DuckDB replay the
whole pipeline for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.dedup import tokens_expr
from legendary_data_pipeline_spark.operators.ranking import top_k_per_group


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_text: str = "query_text",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k documents per query under BM25.

    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the standard non-negative
    variant); tf saturates with k1 and normalizes by document length
    against the corpus mean. Duplicate terms within a query count once
    (set semantics — the common choice for short seed queries).
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    avgdl = (
        dl.agg(F.sum("dl")).first()[0] or 0
    ) / float(n_docs or 1)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    q_terms = queries.select(
        F.col(query_id),
        F.explode(
            F.array_distinct(tokens_expr(query_text))
        ).alias("term"),
    )

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm_tf = (
        F.col("tf")
        * (F.lit(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.lit(avgdl or 1.0)
            )
        )
    )
    # Restrict the document-frequency table to query terms BEFORE it
    # broadcasts — query-vocabulary-sized, not corpus-vocabulary-sized.
    df_q = df_.join(
        F.broadcast(q_terms.select("term").distinct()), "term", "left_semi"
    )
    scored = (
        tf.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(df_q), "term")
        .join(dl, id_col)
        .groupBy(query_id, id_col)
        .agg(F.round(F.sum(idf * norm_tf), round_digits).alias("score"))
    )
    return top_k_per_group(
        scored,
        [query_id],
        [F.col("score").desc(), F.col(id_col).asc()],
        k=k,
        rank_col="rank",
    ).select(query_id, id_col, "rank", "score")
