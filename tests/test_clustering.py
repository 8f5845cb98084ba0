"""Topic clustering contracts: separable topics recover, assignment is
deterministic, and the balanced draw respects per-cluster quotas.
"""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.clustering import (
    cluster_balanced_take_n,
    kmeans_topics,
)

TOPICS = {
    0: "alpha beta gamma delta epsilon zeta",
    1: "red green blue yellow purple orange",
    2: "spark flink trino duck presto hive",
}


def _topic_corpus(spark, per_topic=40):
    rows = []
    for t, vocab in TOPICS.items():
        words = vocab.split()
        for i in range(per_topic):
            # Rotate the vocabulary so docs differ but stay on-topic.
            body = " ".join(words[(i + j) % len(words)] for j in range(12))
            rows.append((t * 1000 + i, body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kmeans_recovers_separable_topics(spark):
    docs = _topic_corpus(spark)
    got = {
        r["doc_id"]: r["cluster"]
        for r in kmeans_topics(docs, k=3, train_fraction=1.0).collect()
    }
    assert len(got) == 120
    # Purity: within each true topic, the modal cluster dominates.
    for t in TOPICS:
        labels = [got[t * 1000 + i] for i in range(40)]
        modal = max(set(labels), key=labels.count)
        assert labels.count(modal) / len(labels) >= 0.9, (t, labels)
    # The three topics land in three DISTINCT clusters.
    modal_of = {
        t: max(
            set(got[t * 1000 + i] for i in range(40)),
            key=[got[t * 1000 + i] for i in range(40)].count,
        )
        for t in TOPICS
    }
    assert len(set(modal_of.values())) == 3
    # Determinism.
    again = {
        r["doc_id"]: r["cluster"]
        for r in kmeans_topics(docs, k=3, train_fraction=1.0).collect()
    }
    assert again == got


def test_cluster_balanced_take_n_quotas(spark):
    docs = _topic_corpus(spark)
    picked = cluster_balanced_take_n(docs, 10, k=3)
    rows = picked.collect()
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r["cluster"], []).append(r["doc_id"])
    assert all(len(v) == 10 for v in per_cluster.values())
    assert len(rows) == 10 * len(per_cluster)
    # Reproducible draw.
    again = {r["doc_id"] for r in cluster_balanced_take_n(docs, 10, k=3).collect()}
    assert again == {r["doc_id"] for r in rows}


def _vec_corpus(spark):
    # 3 well-separated directions; ids 0-2 double as the frozen codebook.
    import math

    rows = []
    for vid in range(60):
        axis = vid % 3
        base = [0.0, 0.0, 0.0]
        base[axis] = 1.0
        # small deterministic wiggle keeps vectors distinct
        base[(axis + 1) % 3] = 0.05 * math.sin(vid)
        rows.append((vid, [float(x) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_fixed_codebook_assign_routes_to_nearest(spark):
    from legendary_data_pipeline_spark.operators.clustering import (
        fixed_codebook_assign,
    )

    emb = _vec_corpus(spark)
    got = {
        r["vec_id"]: r["cluster"]
        for r in fixed_codebook_assign(emb, n_centroids=3).collect()
    }
    assert len(got) == 60
    # centroids are ids 0/1/2 on distinct axes → every vector routes to
    # the centroid sharing its axis
    for vid, cl in got.items():
        assert cl == vid % 3, (vid, cl)


def test_cluster_fixed_balanced_take_n_quota_and_determinism(spark):
    from legendary_data_pipeline_spark.operators.clustering import (
        cluster_fixed_balanced_take_n,
    )

    emb = _vec_corpus(spark)
    rows = cluster_fixed_balanced_take_n(
        emb, n_per_cluster=7, n_centroids=3
    ).collect()
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r["cluster"], []).append(r["vec_id"])
    assert set(per_cluster) == {0, 1, 2}
    assert all(len(v) == 7 for v in per_cluster.values())
    # sample_rank is 1..7 within each cluster
    ranks = {}
    for r in rows:
        ranks.setdefault(r["cluster"], []).append(r["sample_rank"])
    assert all(sorted(v) == list(range(1, 8)) for v in ranks.values())
    again = {
        (r["vec_id"], r["cluster"], r["sample_rank"])
        for r in cluster_fixed_balanced_take_n(
            emb, n_per_cluster=7, n_centroids=3
        ).collect()
    }
    assert again == {(r["vec_id"], r["cluster"], r["sample_rank"]) for r in rows}
