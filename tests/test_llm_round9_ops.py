"""Contracts for the round-9 LLM-pipeline additions: bigram surprisal
gate (X172), token-budget curriculum head (X173), BPE fertility
(X174 — oracle-covered; plan shape here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.curation import (
    token_budget_head,
)
from legendary_data_pipeline_spark.operators.lm import (
    bigram_surprisal_gate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# bigram surprisal gate
# ---------------------------------------------------------------------------


def test_bigram_gate_orders_matter(spark):
    # trusted corpus has a strong bigram structure ("a b" always);
    # a doc with the SAME unigrams in scrambled order must score
    # strictly higher surprisal than the in-order doc.
    trusted = _docs(spark, [(i, "a b a b a b a b") for i in range(5)])
    docs = _docs(spark, [(100, "a b a b"), (101, "b a b a")])
    out = {
        r.doc_id: r
        for r in bigram_surprisal_gate(
            docs, trusted, max_mean_micro=10_000_000
        ).collect()
    }
    # in-order doc: bigrams (a,b),(b,a),(a,b) — (a,b) is frequent
    # scrambled doc: (b,a),(a,b),(b,a) — (b,a) occurs less often
    assert out[100].n_bigrams == 3 and out[101].n_bigrams == 3
    assert out[100].mean_surprisal_micro < out[101].mean_surprisal_micro


def test_bigram_gate_hand_computed(spark):
    # trusted: single doc "x y x y" → bigrams (x,y)x2, (y,x)x1
    # c1(x)=2, c1(y)=1, V=2
    # P(y|x) = (2+1)/(2+2) = 0.75; P(x|y) = (1+1)/(1+2) = 2/3
    import math

    trusted = _docs(spark, [(0, "x y x y")])
    docs = _docs(spark, [(1, "x y"), (2, "z z")])
    out = {
        r.doc_id: r
        for r in bigram_surprisal_gate(
            docs, trusted, max_mean_micro=300_000
        ).collect()
    }
    w_xy = -math.floor(math.log(3.0 / 4.0) * 1e6)
    assert out[1].mean_surprisal_micro == w_xy  # one bigram, ≈287683
    assert out[1].kept is True
    # doc 2: context z unseen → global OOV weight -floor(ln(1/V)·1e6)
    w_oov = -math.floor(math.log(1.0 / 2.0) * 1e6)
    assert out[2].mean_surprisal_micro == w_oov  # ≈693148
    assert out[2].kept is False


def test_bigram_gate_short_docs_null(spark):
    trusted = _docs(spark, [(0, "a b c")])
    docs = _docs(spark, [(1, "single"), (2, ""), (3, "a b")])
    out = {
        r.doc_id: r
        for r in bigram_surprisal_gate(
            docs, trusted, max_mean_micro=10_000_000
        ).collect()
    }
    for d in (1, 2):
        assert out[d].n_bigrams == 0
        assert out[d].mean_surprisal_micro is None
        assert out[d].kept is False
    assert out[3].n_bigrams == 1


def test_bigram_gate_context_fallback_between_oov_levels(spark):
    # seen-context/unseen-bigram weight must be HIGHER than a seen
    # bigram's and the unseen-context weight higher still when the
    # context is frequent.
    trusted = _docs(spark, [(0, "a b a b a c")])
    docs = _docs(spark, [(1, "a b"), (2, "a z"), (3, "q z")])
    out = {
        r.doc_id: r.mean_surprisal_micro
        for r in bigram_surprisal_gate(
            docs, trusted, max_mean_micro=1
        ).collect()
    }
    # seen bigram (a,b) < unseen bigram with seen context (a,z)
    assert out[1] < out[2]
    # context a has c1=3, V=3 → 1/(3+3); unseen context q → 1/3
    # here the GLOBAL fallback is actually cheaper (smaller denom):
    assert out[3] < out[2]


# ---------------------------------------------------------------------------
# token budget head
# ---------------------------------------------------------------------------


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, quality_score long, token_count long"
    )


def test_budget_head_exact_frontier(spark):
    rows = [
        (1, 90, 100),
        (2, 90, 100),
        (3, 80, 100),
        (4, 70, 100),
    ]
    out = {
        r.doc_id: r
        for r in token_budget_head(
            _scored(spark, rows), budget=250,
            weight_col="token_count", order_col="quality_score",
        ).collect()
    }
    # order: 1 (cum 100), 2 (200), 3 (300 > 250), 4 (400)
    assert out[1].selected and out[2].selected
    assert not out[3].selected and not out[4].selected
    assert out[1].cum_weight == 100 and out[2].cum_weight == 200
    assert out[3].cum_weight == 300 and out[4].cum_weight == 400


def test_budget_head_tiebreak_by_id(spark):
    # equal scores: lower doc_id wins the budget
    rows = [(10, 50, 60), (11, 50, 60), (12, 50, 60)]
    out = {
        r.doc_id: r
        for r in token_budget_head(
            _scored(spark, rows), budget=120,
            weight_col="token_count", order_col="quality_score",
        ).collect()
    }
    assert out[10].selected and out[11].selected and not out[12].selected


def test_budget_head_zero_budget_and_whole_doc_rule(spark):
    rows = [(1, 9, 10)]
    out = token_budget_head(
        _scored(spark, rows), budget=5,
        weight_col="token_count", order_col="quality_score",
    ).collect()[0]
    # a doc that would overflow the budget is NOT partially taken
    assert out.selected is False
    out0 = token_budget_head(
        _scored(spark, rows), budget=0,
        weight_col="token_count", order_col="quality_score",
    ).collect()[0]
    assert out0.selected is False
    with pytest.raises(ValueError, match="budget"):
        token_budget_head(
            _scored(spark, rows), budget=-1,
            weight_col="token_count", order_col="quality_score",
        )


def test_budget_head_rejects_duplicate_ids(spark):
    # duplicate (score, id) rows make cum_weight partition-dependent —
    # the in-plan raise_error guard (r10, the theil_sen precedent)
    # must fail the job instead of silently picking a frontier
    rows = [(1, 90, 100), (1, 90, 50), (2, 80, 100)]
    with pytest.raises(Exception, match="duplicate"):
        token_budget_head(
            _scored(spark, rows), budget=250,
            weight_col="token_count", order_col="quality_score",
        ).collect()


def test_budget_head_partition_invariance(spark):
    rows = [(i, i % 4 * 10, 5 + i % 3) for i in range(60)]
    a = token_budget_head(
        _scored(spark, rows).repartition(1), budget=150,
        weight_col="token_count", order_col="quality_score",
    ).orderBy("doc_id").collect()
    b = token_budget_head(
        _scored(spark, rows).repartition(7), budget=150,
        weight_col="token_count", order_col="quality_score",
    ).orderBy("doc_id").collect()
    assert a == b
    # the selected set is a prefix of the (score desc, id) order
    sel = [(r.quality_score, r.doc_id) for r in a if r.selected]
    uns = [(r.quality_score, r.doc_id) for r in a if not r.selected]
    if sel and uns:
        # rank key where larger = earlier in the (score desc, id asc)
        # order; prefix property ⇔ worst selected ≥ best unselected
        worst_sel = min((s, -i) for s, i in sel)
        best_uns = max((s, -i) for s, i in uns)
        assert worst_sel >= best_uns
