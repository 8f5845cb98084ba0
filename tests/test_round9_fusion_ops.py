"""Contracts for X175-X177: link prediction, equal-frequency binning,
golden-record survivorship."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.entity import (
    survivorship_fuse,
)
from legendary_data_pipeline_spark.operators.graph import (
    link_prediction_topk,
)
from legendary_data_pipeline_spark.operators.stats import equal_freq_bins


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------


def test_link_prediction_hand_computed(spark):
    # path graph 1-2-3: the only distance-2 non-edge is (1,3) via 2.
    # deg(1)=1, deg(3)=1, cn=1 → jaccard = 1/(1+1-1) = 1.0
    out = link_prediction_topk(
        _edges(spark, [(1, 2), (2, 3)]), top_k=10
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a, r.b) == (1, 3)
    assert r.common_neighbors == 1 and r.jaccard == 1.0
    assert r.deg_a == 1 and r.deg_b == 1


def test_link_prediction_excludes_existing_edges(spark):
    # triangle 1-2-3 plus leaf 4 on node 1: existing edges never
    # appear; candidates are (2,4) and (3,4) via node 1.
    out = link_prediction_topk(
        _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4)]), top_k=10
    ).collect()
    pairs = {(r.a, r.b) for r in out}
    assert pairs == {(2, 4), (3, 4)}


def test_link_prediction_ranking_and_topk(spark):
    # hub 0 connects 1..4; 1-2 also share neighbor 5.
    # candidate (1,2): cn=2 (via 0 and 5); others cn=1.
    e = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (2, 5)]
    out = link_prediction_topk(_edges(spark, e), top_k=1).collect()
    assert len(out) == 1
    assert (out[0].a, out[0].b) == (1, 2)
    assert out[0].common_neighbors == 2


def test_link_prediction_degree_cap(spark):
    # star hub 0 with leaves 1..5: without a cap every leaf pair is a
    # candidate; capping at degree 2 removes the hub entirely.
    e = [(0, i) for i in range(1, 6)] + [(1, 2)]
    uncapped = link_prediction_topk(_edges(spark, e), top_k=100).collect()
    assert len(uncapped) > 0
    capped = link_prediction_topk(
        _edges(spark, e), top_k=100, max_degree=2
    ).collect()
    # hub-free subgraph has only edge (1,2) → no wedges at all
    assert capped == []


def test_link_prediction_input_canonicalized(spark):
    # duplicate and reversed edges collapse before counting
    e = [(1, 2), (1, 2), (2, 3), (3, 2)]
    out = link_prediction_topk(_edges(spark, e), top_k=10).collect()
    assert len(out) == 1 and out[0].common_neighbors == 1


def test_link_prediction_reversed_edge_not_predicted(spark):
    # review regression: a triangle whose third edge arrives reversed
    # must NOT be emitted as a predicted non-edge — the edge set
    # canonicalizes with least/greatest before dedup and the anti-join.
    e = [(1, 2), (2, 3), (3, 1)]
    out = link_prediction_topk(_edges(spark, e), top_k=10).collect()
    assert out == []
    # self-loops are dropped, not counted as wedges
    e2 = [(1, 2), (2, 2), (2, 3)]
    out2 = link_prediction_topk(_edges(spark, e2), top_k=10).collect()
    assert {(r.a, r.b) for r in out2} == {(1, 3)}
    r = out2[0]
    assert r.deg_a == 1 and r.deg_b == 1  # loop absent from degrees


def test_survivorship_null_key_cluster_gets_modal_value(spark):
    # review regression: NULL is a cluster key; its modal value must
    # attach like every other rule's (null-safe join).
    rows = [
        (None, "alice", "s", 1, 2),
        (None, "alice", "s", 2, 3),
        (None, "bob", "s", 3, 1),
    ]
    out = survivorship_fuse(
        _records(spark, rows), ["k"], most_frequent=["name"],
        max_cols=["amount"],
    ).collect()
    assert len(out) == 1
    assert out[0].k is None and out[0].name == "alice"
    assert out[0].amount == 3


# ---------------------------------------------------------------------------
# equal-frequency binning
# ---------------------------------------------------------------------------


def test_equal_freq_bins_balanced(spark):
    # 100 distinct values, 10 bins → 10 values / 10 rows per bin
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    out = equal_freq_bins(df, "v", n_bins=10).orderBy("bin").collect()
    assert len(out) == 10
    for i, r in enumerate(out):
        assert r.bin == i and r.n_rows == 10 and r.n_values == 10
        assert r.lo == i * 10 and r.hi == i * 10 + 9


def test_equal_freq_bins_ties_never_split(spark):
    # one value holds 90% of rows: it lands in exactly one bin
    rows = [(5,)] * 90 + [(i,) for i in range(10)]
    df = spark.createDataFrame(rows, "v long")
    out = equal_freq_bins(df, "v", n_bins=4).collect()
    holding = [r for r in out if r.lo <= 5 <= r.hi and r.n_rows >= 90]
    assert len(holding) == 1
    assert sum(r.n_rows for r in out) == 100


def test_equal_freq_bins_grouped_independent(spark):
    rows = [("a", i) for i in range(20)] + [("b", 1000 + i) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = equal_freq_bins(df, "v", n_bins=2, group_cols=["g"]).collect()
    by = {(r.g, r.bin): r for r in out}
    assert by[("a", 0)].hi == 9 and by[("a", 1)].lo == 10
    assert by[("b", 0)].hi == 1009 and by[("b", 1)].lo == 1010


def test_equal_freq_bins_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="n_bins"):
        equal_freq_bins(df, "v", n_bins=0)


# ---------------------------------------------------------------------------
# survivorship fusion
# ---------------------------------------------------------------------------


def _records(spark, rows):
    return spark.createDataFrame(
        rows, "k long, name string, status string, ts long, amount long"
    )


def test_survivorship_rules(spark):
    rows = [
        (1, "alice", "new", 10, 5),
        (1, "alice", "old", 20, 9),
        (1, "alicia", "mid", 15, 7),
    ]
    out = survivorship_fuse(
        _records(spark, rows),
        ["k"],
        most_frequent=["name"],
        latest_by="ts",
        latest_cols=["status"],
        max_cols=["amount"],
    ).collect()[0]
    assert out.n_records == 3
    assert out.name == "alice"  # 2 votes beat 1
    assert out.status == "old"  # ts=20 wins
    assert out.amount == 9


def test_survivorship_tie_rules_deterministic(spark):
    # modal tie → lexicographically smallest; latest tie on ts → max
    rows = [
        (1, "bob", "x", 10, 1),
        (1, "ann", "y", 10, 1),
    ]
    out = survivorship_fuse(
        _records(spark, rows),
        ["k"],
        most_frequent=["name"],
        latest_by="ts",
        latest_cols=["status"],
    ).collect()[0]
    assert out.name == "ann"
    assert out.status == "y"


def test_survivorship_longest_and_nulls(spark):
    rows = [
        (1, "a", None, 10, None),
        (1, "abc", None, 11, None),
        (1, "ab", None, 12, None),
        (2, None, None, 1, None),
    ]
    out = {
        r.k: r
        for r in survivorship_fuse(
            _records(spark, rows),
            ["k"],
            most_frequent=["status"],
            longest_cols=["name"],
            max_cols=["amount"],
        ).collect()
    }
    assert out[1].name == "abc"
    assert out[1].status is None and out[1].amount is None
    assert out[2].name is None and out[2].n_records == 1


def test_survivorship_latest_requires_ts(spark):
    df = _records(spark, [(1, "a", "s", 1, 1)])
    with pytest.raises(ValueError, match="latest_by"):
        survivorship_fuse(df, ["k"], latest_cols=["status"])


def test_equal_freq_bins_null_group_retained(spark):
    rows = [(None, i) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = equal_freq_bins(df, "v", n_bins=2, group_cols=["g"]).collect()
    assert len(out) == 2
    assert all(r.g is None for r in out)
    assert sum(r.n_rows for r in out) == 20
