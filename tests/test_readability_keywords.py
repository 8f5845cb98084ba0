"""Contracts for readability scoring and tf-rarity keyword extraction."""

from __future__ import annotations

import pytest

from legendary_data_pipeline_spark.operators.textstats import (
    keywords_tf_rarity,
    readability,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "The cat sat. The cat ran! Did it nap?"),
        (2, "word"),
        (3, "   "),            # no words -> dropped
        (4, "no terminal punctuation here at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_readability_counts_and_formula(docs):
    out = {r["doc_id"]: r for r in readability(docs).collect()}
    assert 3 not in out
    d1 = out[1]
    assert d1["n_words"] == 9
    assert d1["n_sentences"] == 3
    # vowel groups in "the cat sat. the cat ran! did it nap?":
    # e,a,a,e,a,a,i,i,a = 9
    assert d1["n_syllables"] == 9
    expected = 206.835 - 1.015 * (9 / 3) - 84.6 * (9 / 9)
    assert d1["flesch"] == pytest.approx(expected, abs=1e-6)
    # sentence floor: doc without terminal punctuation counts 1 sentence
    assert out[4]["n_sentences"] == 1


def test_keywords_rank_by_tf_then_rarity(spark):
    rows = [
        (1, "alpha alpha beta common common common"),
        (2, "common beta gamma gamma"),
        (3, "common delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = keywords_tf_rarity(docs, top_k=2)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df_docs"])
        for r in out.collect()
    }
    # doc 1: common tf=3 beats alpha tf=2
    assert got[(1, 1)] == ("common", 3, 3)
    assert got[(1, 2)] == ("alpha", 2, 1)
    # doc 2: gamma tf=2 first; then beta vs common tie on tf=1 ->
    # rarer beta (df=2) beats common (df=3)
    assert got[(2, 1)] == ("gamma", 2, 1)
    assert got[(2, 2)] == ("beta", 1, 2)
    # doc 3: tf tie -> delta (df=1) beats common (df=3)
    assert got[(3, 1)] == ("delta", 1, 1)
    assert got[(3, 2)] == ("common", 1, 3)


def test_keywords_caps_at_topk_and_total_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    out = keywords_tf_rarity(docs, top_k=3).collect()
    assert len(out) == 3
    # all tf=1, all df=1 -> alphabetical tiebreak
    assert [r["term"] for r in sorted(out, key=lambda r: r["rank"])] == [
        "a", "b", "c",
    ]


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert readability(empty).count() == 0
    assert keywords_tf_rarity(empty).count() == 0
