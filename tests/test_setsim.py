"""Contracts for the prefix-filtering exact Jaccard join (setsim.py).

The critical property is COMPLETENESS: prefix filtering is an exact
algorithm — every pair at or above the threshold must survive, identical
to a brute-force all-pairs scan. (Losing pairs is the classic bug in
prefix-filter implementations: wrong prefix length or inconsistent
global token order.)
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.setsim import (
    prefix_filter_jaccard_join,
    shingle_ws_distinct,
    tokenize_ws_distinct,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "entirely different words here without overlap"),
    (5, "quick brown fox"),                                # subset of 1
    (6, "lorem ipsum dolor sit amet consectetur"),
    (7, "lorem ipsum dolor sit amet elitr"),               # near-dup of 6
    (8, "   "),                                            # empty after trim
    (9, "single"),
]


def _brute_pairs(tokenized_rows, p, q):
    sets = {r["__sid"]: set(r["__tokens"]) for r in tokenized_rows}
    out = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * q >= union * p:
            out.add((a, b))
    return out


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("p,q", [(1, 2), (3, 10), (1, 1)])
def test_completeness_vs_bruteforce_unigrams(spark, docs_df, p, q):
    tok = tokenize_ws_distinct(docs_df, "text", "doc_id")
    expected = _brute_pairs(tok.collect(), p, q)
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard_join(tok, p, q).collect()
    }
    assert got == expected, f"threshold {p}/{q}"


def test_completeness_vs_bruteforce_shingles(spark, docs_df):
    sh = shingle_ws_distinct(docs_df, "text", "doc_id", n=3)
    expected = _brute_pairs(sh.collect(), 1, 2)
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard_join(sh, 1, 2).collect()
    }
    assert got == expected
    # doc 3 is an exact dup of doc 1: jaccard must be exactly 1.0
    full = {
        (r["id_a"], r["id_b"]): r
        for r in prefix_filter_jaccard_join(sh, 1, 2).collect()
    }
    assert full[(1, 3)]["jaccard"] == 1.0
    assert full[(1, 3)]["inter"] == full[(1, 3)]["size_a"]


def test_output_invariants(spark, docs_df):
    tok = tokenize_ws_distinct(docs_df, "text", "doc_id")
    for r in prefix_filter_jaccard_join(tok, 1, 2).collect():
        assert r["id_a"] < r["id_b"]
        union = r["size_a"] + r["size_b"] - r["inter"]
        assert 2 * r["inter"] >= union
        assert r["jaccard"] == pytest.approx(r["inter"] / union, abs=1e-6)


def test_tokenizers_drop_empty_and_short_docs(spark, docs_df):
    tok = tokenize_ws_distinct(docs_df, "text", "doc_id")
    ids = {r["__sid"] for r in tok.select("__sid").collect()}
    assert 8 not in ids and 9 in ids
    sh = shingle_ws_distinct(docs_df, "text", "doc_id", n=3)
    sids = {r["__sid"] for r in sh.select("__sid").collect()}
    assert 8 not in sids and 9 not in sids  # "single" has < 3 words


def test_shingles_are_distinct_sorted(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    row = shingle_ws_distinct(df, "text", "doc_id", n=3).collect()[0]
    toks = row["__tokens"]
    assert toks == sorted(set(toks))
    assert set(toks) == {"a b a", "b a b"}


def test_invalid_threshold_rejected(spark, docs_df):
    tok = tokenize_ws_distinct(docs_df, "text", "doc_id")
    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(tok, 0, 2)
    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(tok, 3, 2)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    tok = tokenize_ws_distinct(empty, "text", "doc_id")
    assert prefix_filter_jaccard_join(tok, 1, 2).count() == 0


def test_plan_has_no_cartesian(spark, docs_df):
    tok = shingle_ws_distinct(docs_df, "text", "doc_id", n=3)
    plan = prefix_filter_jaccard_join(tok, 1, 2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# property: completeness holds on randomized corpora and thresholds
# ---------------------------------------------------------------------------

def test_prefix_filter_completeness_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vocab = [f"w{i}" for i in range(12)]  # small vocab -> real overlaps
    doc = st.lists(st.sampled_from(vocab), min_size=1, max_size=8)
    corpus = st.lists(doc, min_size=2, max_size=12)
    threshold = st.sampled_from([(1, 2), (2, 3), (4, 5), (1, 1)])

    @settings(max_examples=12, deadline=None)
    @given(corpus, threshold)
    def check(docs, pq):
        p, q = pq
        rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        tok = tokenize_ws_distinct(df, "text", "doc_id")
        expected = _brute_pairs(tok.collect(), p, q)
        got = {
            (r["id_a"], r["id_b"])
            for r in prefix_filter_jaccard_join(tok, p, q).collect()
        }
        assert got == expected, (docs, pq)

    check()
