"""Contract tests for late-interaction (MaxSim) retrieval beyond the
DuckDB-oracle row: hand-computed scores, reshape geometry, and ranking
semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.retrieval import (
    maxsim_expr,
    maxsim_topk,
    multivec_from_embedding,
)


def test_multivec_reshape_geometry(spark):
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(12)], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    row = multivec_from_embedding(df, n_vecs=3).collect()[0]
    assert row["vecs"] == [
        [0.0, 1.0, 2.0, 3.0],
        [4.0, 5.0, 6.0, 7.0],
        [8.0, 9.0, 10.0, 11.0],
    ]


def test_maxsim_known_value(spark):
    # Q = [e1, e2]; D = [2*e1, 3*e2, e1+e2]
    # q1 best match: <e1, 2e1>=2 ; q2 best: <e2, 3e2>=3 → maxsim = 5
    df = spark.createDataFrame(
        [([[1.0, 0.0], [0.0, 1.0]], [[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])],
        "q array<array<double>>, d array<array<double>>",
    )
    got = df.select(maxsim_expr("q", "d").alias("s")).collect()[0]["s"]
    assert got == 5.0


def test_maxsim_topk_excludes_self_and_ranks_copy_first(spark):
    # doc 10 is an exact copy of query 0 — must rank 1 for it.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (10, [1.0, 0.0, 0.0, 0.0], 0),
        (11, [0.5, 0.5, 0.0, 0.0], 0),
        (12, [0.0, 0.0, 1.0, 1.0], 0),
        (20, [9.0, 9.0, 9.0, 9.0], 1),  # different label → blocked out
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    mv = multivec_from_embedding(emb, n_vecs=2)
    out = maxsim_topk(mv, k=2, query_filter=F.col("vec_id") == 0).collect()
    # doc 10 (exact copy, score 1.0 via its [1,0] token) ties doc 12
    # (whose [1,1] token also dots 1.0 with q=[1,0]) — tie breaks on id;
    # doc 11 scores 0.5 and drops out of the top-2.
    assert [r["neighbor_id"] for r in out] == [10, 12]
    assert all(r["query_id"] == 0 for r in out)
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2
    # Self never appears even though it scores highest.
    assert 0 not in {r["neighbor_id"] for r in out}


# ---------------------------------------------------------------------------
# hard-negative mining (similarity module, contrastive training pairs)
# ---------------------------------------------------------------------------


def test_hard_negatives_cross_label_only_and_ranked(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [1.0, 0.01], 0),  # same label — must never appear
        (2, [1.0, 0.1], 1),   # hardest negative (closest, other label)
        (3, [0.0, 1.0], 1),   # easy negative
        (4, [0.9, 0.2], 2),   # second-hardest
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(
        emb, k=2, query_filter=F.col("vec_id") == 0
    ).collect()
    assert [r["negative_id"] for r in out] == [2, 4]
    assert all(r["negative_label"] != 0 for r in out)
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["cos_sim"] > out[1]["cos_sim"]
