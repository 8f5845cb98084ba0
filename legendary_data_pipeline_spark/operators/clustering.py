"""Topic clustering + cluster-balanced selection over hashed features.

Cluster-balanced sampling (SemDeDup / cluster-then-quota selection):
embed every document as a hashed-n-gram count vector, k-means it with a
driver-trained codebook, and draw a per-cluster quota — the corpus-mix
move that stops one over-represented topic from dominating a training
sample, without any external embedding model.

Engine shape (100 TB): identical contract to the IVF coarse quantizer
(similarity.py) — the codebook trains on a bounded hash-gated SAMPLE of
dense m-dim feature vectors (driver-side numpy Lloyd, metadata-scale
collect), assignment streams the corpus through one Arrow-batched UDF
(centroids ride the closure, one matmul per batch), and the quota draw
is the existing `stratified_take_n` on the cluster id. Features are L2-
normalized so Euclidean k-means behaves like cosine on count profiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.dsir import hashed_ngram_counts
from legendary_data_pipeline_spark.operators.sampling import (
    bounded_hash_sample,
)
from legendary_data_pipeline_spark.operators.similarity import _lloyd_codebook


def doc_feature_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    m: int = 256,
) -> DataFrame:
    """(id, buckets, counts): each document's sparse hashed profile,
    bucket-sorted so densification is a deterministic scatter."""
    counts = hashed_ngram_counts(df, id_col, text_col, shingle_n, m)
    pairs = F.array_sort(
        F.collect_list(F.struct("bucket", "cnt"))
    )
    return counts.groupBy(id_col).agg(
        F.transform(pairs, lambda s: s["bucket"]).alias("buckets"),
        F.transform(pairs, lambda s: s["cnt"]).alias("counts"),
    )


def _densify(bk: np.ndarray, ct: np.ndarray, m: int) -> np.ndarray:
    v = np.zeros(m, dtype=np.float64)
    v[bk] = ct
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def kmeans_topics(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    m: int = 256,
    seed: int = 33,
    max_train: int = 4096,
    train_fraction: float = 0.2,
) -> DataFrame:
    """(id, cluster): deterministic k-means topic assignment over
    L2-normalized hashed-n-gram profiles."""
    feats = doc_feature_vectors(df, id_col, text_col, shingle_n, m)
    sample = bounded_hash_sample(
        feats,
        id_col,
        seed,
        max_rows=max_train,
        fraction=train_fraction,
        min_rows=k * 4,
    )
    if not sample:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster int"
        )
    X = np.stack(
        [
            _densify(
                np.asarray(r["buckets"], dtype=np.int64),
                np.asarray(r["counts"], dtype=np.float64),
                m,
            )
            for r in sample
        ]
    )
    C = _lloyd_codebook(X, k, iters=8, seed=seed)
    c_norm2 = (C * C).sum(axis=1)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(bk: pd.Series, ct: pd.Series) -> pd.Series:
        V = np.stack(
            [
                _densify(
                    np.asarray(b, dtype=np.int64),
                    np.asarray(c, dtype=np.float64),
                    m,
                )
                for b, c in zip(bk, ct)
            ]
        )
        d2 = V @ C.T * (-2.0) + c_norm2[None, :]
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return feats.select(
        F.col(id_col), assign("buckets", "counts").alias("cluster")
    )


def cluster_balanced_take_n(
    df: DataFrame,
    n_per_cluster: int,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    m: int = 256,
    seed: int = 33,
) -> DataFrame:
    """Deterministic cluster-balanced selection: assign topics, then
    exactly min(n, |cluster|) docs per cluster by seeded hash order
    (`stratified_take_n` on the cluster id) — topic-diverse by
    construction, reproducible across engines and reruns."""
    from legendary_data_pipeline_spark.operators.curation import (
        stratified_take_n,
    )

    # LEFT join + sentinel cluster −1: documents too short to produce
    # any n-gram feature (fewer than shingle_n tokens, empty/NULL text)
    # still participate in the draw as their own stratum instead of
    # silently vanishing from the sample.
    assigned = df.join(
        kmeans_topics(df, k, id_col, text_col, shingle_n, m, seed),
        id_col,
        "left",
    ).withColumn("cluster", F.coalesce(F.col("cluster"), F.lit(-1)))
    return stratified_take_n(
        assigned,
        n_per_cluster,
        stratum_col="cluster",
        id_col=id_col,
        seed=seed,
    )


def fixed_codebook_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) nearest-centroid assignment against a FIXED
    codebook: the corpus vectors with the ``n_centroids`` smallest ids
    (same freeze convention as `similarity.ivf_fixed_topk`). Distances
    are declarative sequential-fold arithmetic (`zip_with`/`aggregate`,
    ties → lower centroid id), so a SQL oracle replays every assignment
    bit-for-bit — the hash-oracle-able twin of the trained
    `kmeans_topics` (whose Lloyd codebook is rows-only checkable).

    Plan shape: the codebook is an ``n_centroids``-row broadcast; the
    corpus streams through one broadcast nested-loop fan-out and a
    per-vector top-1 window — no shuffle of the corpus besides the
    window's hash partitioning on the id.
    """
    base = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    cents = base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("__cid"), F.col("__v").alias("__cv")
    )
    xx = F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x * x)
    cc = F.aggregate(F.col("__cv"), F.lit(0.0), lambda a, x: a + x * x)
    dot = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    d2 = xx + cc - F.lit(2.0) * dot
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(d2.asc(), F.col("__cid").asc())
    return (
        base.crossJoin(F.broadcast(cents))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("__cid").alias("cluster"))
    )


def cluster_fixed_balanced_take_n(
    embeddings: DataFrame,
    n_per_cluster: int,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 33,
) -> DataFrame:
    """Cluster-balanced selection with a FIXED codebook: assign every
    vector to its nearest frozen centroid, then draw exactly
    min(n, |cluster|) rows per cluster by seeded hash order. Both
    stages are deterministic declarative expressions, so the whole
    draw replays under a SQL hash oracle — codebook QUALITY stays with
    the trained `cluster_balanced_take_n`; this variant pins the
    selection mechanics (assignment routing, per-cluster quota, hash
    order) exactly.
    """
    from legendary_data_pipeline_spark.operators.curation import (
        stratified_take_n,
    )

    assigned = fixed_codebook_assign(embeddings, n_centroids, id_col, vec_col)
    return stratified_take_n(
        assigned,
        n_per_cluster,
        stratum_col="cluster",
        id_col=id_col,
        seed=seed,
    )
