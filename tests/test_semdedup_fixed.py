"""Contracts for the fixed-codebook SemDeDup twin (X151): cluster
routing, min-id-anchor keeper rule, and the documented difference from
the trained greedy form."""

from __future__ import annotations


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_min_id_anchor_and_dup_of(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        semdedup_fixed,
    )

    # codebook = ids 0,1 (two axes). Cluster 0: ids 0,10,11 all along x
    # (pairwise cos = 1); cluster 1: ids 1,20 along y plus 21 tilted
    # slightly (cos(1,21) high, cos(20,21) high too).
    rows = [
        (0, [1, 0, 0]),
        (1, [0, 1, 0]),
        (10, [2, 0, 0]),
        (11, [3, 0, 0]),
        (20, [0, 5, 0]),
        (21, [0, 4, 0.1]),
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup_fixed(_emb(spark, rows), n_centroids=2, tau=0.95)
        .collect()
    }
    # routing
    assert out[10]["cluster"] == 0 and out[11]["cluster"] == 0
    assert out[20]["cluster"] == 1 and out[21]["cluster"] == 1
    # min-id anchors: 0 keeps; 10,11 dup_of 0 (the SMALLEST anchor, not 10)
    assert out[0]["keep"] is True
    assert (out[10]["keep"], out[10]["dup_of"]) == (False, 0)
    assert (out[11]["keep"], out[11]["dup_of"]) == (False, 0)
    # cluster 1: 1 keeps; 20 and 21 are within tau of id 1 → dup_of 1
    assert out[1]["keep"] is True
    assert (out[20]["keep"], out[20]["dup_of"]) == (False, 1)
    assert (out[21]["keep"], out[21]["dup_of"]) == (False, 1)


def test_threshold_boundary_uses_rounded_cosine(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        semdedup_fixed,
    )

    # cos(a, b) = 0.8 exactly: with tau=0.8 it's a dup, with tau
    # slightly above it is not — pins the >= on the ROUNDED value.
    rows = [(0, [1, 0]), (5, [0.8, 0.6])]
    dup = {
        r["vec_id"]: r["keep"]
        for r in semdedup_fixed(_emb(spark, rows), n_centroids=1, tau=0.8)
        .collect()
    }
    keep = {
        r["vec_id"]: r["keep"]
        for r in semdedup_fixed(
            _emb(spark, rows), n_centroids=1, tau=0.800001
        ).collect()
    }
    assert dup[5] is False and keep[5] is True
    assert dup[0] is True and keep[0] is True


def test_cross_cluster_pairs_never_compared(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        semdedup_fixed,
    )

    # ids 0,1 are the codebook and are themselves nearly identical —
    # but they seed DIFFERENT clusters, so near-identical vectors that
    # route to different centroids are not compared (the documented
    # SemDeDup recall trade).
    rows = [
        (0, [1, 0.0]),
        (1, [1, 0.02]),
        (10, [1, 0.001]),  # routes to 0's centroid
        (11, [1, 0.019]),  # routes to 1's centroid
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup_fixed(_emb(spark, rows), n_centroids=2, tau=0.99)
        .collect()
    }
    assert out[10]["cluster"] != out[11]["cluster"]
    # each is a dup of its own cluster's codebook vector only
    assert out[10]["dup_of"] == 0
    assert out[11]["dup_of"] == 1


def test_matches_greedy_when_no_chained_anchors(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        semdedup,
        semdedup_fixed,
    )

    # On a corpus whose dup graph has no anchor chains (every dup is
    # within tau of a KEPT exemplar), greedy and min-id-anchor agree.
    rows = [
        (0, [1, 0, 0]),
        (1, [0, 1, 0]),
        (10, [2, 0, 0]),
        (20, [0, 3, 0]),
        (30, [0.5, 0.5, 0.7]),  # far from everything
    ]
    emb = _emb(spark, rows)
    fixed = {
        (r["vec_id"], r["keep"])
        for r in semdedup_fixed(emb, n_centroids=2, tau=0.95).collect()
    }
    greedy = {
        (r["vec_id"], r["keep"])
        for r in semdedup(
            emb, n_clusters=2, train_fraction=1.0, tau=0.95
        ).collect()
    }
    # keep/drop verdicts agree (cluster ids may differ — codebooks differ)
    assert fixed == greedy
