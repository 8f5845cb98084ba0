"""Contract tests for the hashed Naive-Bayes quality classifier beyond
its DuckDB-oracle row: separation on a synthetic signal, empty-doc
prior scoring, integer-exactness under repartitioning, and the filter
composition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.classifier import (
    nb_quality_filter,
    score_nb,
    train_nb,
)


def _seed_corpora(spark):
    """Positive seed speaks 'good' vocabulary, negative seed 'spam'
    vocabulary, eval docs are purely one or the other."""
    pos = [(i, "insight analysis rigorous prose careful " * 4) for i in range(40)]
    neg = [(100 + i, "click buy cheap winner prize " * 4) for i in range(40)]
    evals = [
        (1000, "rigorous careful analysis of prose insight"),
        (1001, "buy cheap prize winner click click"),
        (1002, ""),  # empty → scores exactly the prior
        (1003, "   "),  # whitespace-only → same
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(pos), mk(neg), mk(evals)


def test_nb_separates_and_prior_for_empty(spark):
    pos, neg, evals = _seed_corpora(spark)
    weights, prior = train_nb(pos, neg, m=512)
    assert prior == 0  # equal seed sizes → ln(40/40) = 0
    scored = {r["doc_id"]: r for r in score_nb(evals, weights, prior, m=512).collect()}
    assert scored[1000]["score"] > 0 and scored[1000]["predicted_pos"]
    assert scored[1001]["score"] < 0 and not scored[1001]["predicted_pos"]
    assert scored[1002]["score"] == prior
    assert scored[1003]["score"] == prior


def test_nb_prior_shifts_with_class_sizes(spark):
    pos, neg, evals = _seed_corpora(spark)
    # 40 pos vs 4 neg → prior = round(ln(10) * 1e6) = 2302585
    _, prior = train_nb(pos, neg.limit(4), m=512)
    assert prior == 2302585


def test_nb_scores_partition_invariant(spark):
    """Integer-scaled weights ⇒ scores are exact BIGINT sums: any
    repartitioning yields bit-identical scores (a double-sum scorer
    would not)."""
    pos, neg, evals = _seed_corpora(spark)
    weights, prior = train_nb(pos, neg, m=512)
    a = {
        r["doc_id"]: r["score"]
        for r in score_nb(evals, weights, prior, m=512).collect()
    }
    b = {
        r["doc_id"]: r["score"]
        for r in score_nb(
            evals.repartition(7), weights.repartition(5), prior, m=512
        ).collect()
    }
    assert a == b


def test_nb_quality_filter_keeps_raw_columns(spark):
    pos, neg, evals = _seed_corpora(spark)
    out = nb_quality_filter(evals, pos, neg, m=512)
    assert set(out.columns) == {"doc_id", "text", "score", "predicted_pos"}
    kept = out.filter(F.col("predicted_pos")).select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [1000]
