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
