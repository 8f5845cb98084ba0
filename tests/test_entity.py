"""Unit tests for blocked fuzzy entity resolution (operators/entity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.entity import (
    fuzzy_best_match,
    fuzzy_pairs_blocked,
)


def _names_df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_pairs_within_block(spark):
    df = _names_df(
        spark,
        [
            (1, "red widget"),
            (2, "rad widget"),   # dist 1 from "red widget"
            (3, "ted widget"),   # dist 1 from "red widget"
            (4, "red bolt"),     # different block (last token)
            (5, "rad bolt"),     # dist 1 from "red bolt"
        ],
    )
    pairs = fuzzy_pairs_blocked(
        df,
        name_col="name",
        id_col="id",
        block_exprs=[F.element_at(F.split(F.col("name"), " "), -1)],
        max_dist=3,
    )
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in pairs.collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 1
    # "rad widget" vs "ted widget": substitutions at positions 1 and 2
    assert got[(2, 3)] == 2
    assert got[(4, 5)] == 1
    # cross-block pairs never appear
    assert (1, 4) not in got and (3, 5) not in got
    assert len(got) == 4


def test_fuzzy_pairs_null_names_dropped(spark):
    df = _names_df(spark, [(1, None), (2, "bolt"), (3, "bolt")])
    pairs = fuzzy_pairs_blocked(
        df,
        name_col="name",
        id_col="id",
        block_exprs=[F.substring("name", 1, 1)],
        max_dist=2,
    )
    got = [(r.id_a, r.id_b, r.edit_dist) for r in pairs.collect()]
    assert got == [(2, 3, 0)]


def test_fuzzy_pairs_string_ids(spark):
    df = spark.createDataFrame(
        [("a", "gear"), ("b", "gearr")], "id string, name string"
    )
    pairs = fuzzy_pairs_blocked(
        df,
        name_col="name",
        id_col="id",
        block_exprs=[F.substring("name", 1, 1)],
        max_dist=2,
    )
    rows = pairs.collect()
    assert [(r.id_a, r.id_b, r.edit_dist) for r in rows] == [("a", "b", 1)]


def test_best_match_tie_breaks_on_lowest_right_id(spark):
    left = spark.createDataFrame([(10, "red widget")], "lid long, lname string")
    right = spark.createDataFrame(
        [(2, "red widgets"), (1, "red widgett"), (3, "red gadget")],
        "rid long, rname string",
    )
    out = fuzzy_best_match(
        left,
        right,
        left_name="lname",
        right_name="rname",
        left_id="lid",
        right_id="rid",
        left_block=[F.substring("lname", 1, 1)],
        right_block=[F.substring("rname", 1, 1)],
        max_dist=3,
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    # both +1-char candidates are distance 1; id 1 wins the tie
    assert (r.lid, r.rid, r.edit_dist) == (10, 1, 1)


def test_best_match_exclude_equal(spark):
    left = spark.createDataFrame([(1, "bolt")], "lid long, lname string")
    right = spark.createDataFrame(
        [(7, "bolt"), (8, "bolts")], "rid long, rname string"
    )
    kw = dict(
        left_name="lname",
        right_name="rname",
        left_id="lid",
        right_id="rid",
        left_block=[F.substring("lname", 1, 1)],
        right_block=[F.substring("rname", 1, 1)],
        max_dist=2,
    )
    with_self = fuzzy_best_match(left, right, **kw).collect()
    assert (with_self[0].rid, with_self[0].edit_dist) == (7, 0)
    no_self = fuzzy_best_match(
        left, right, exclude_equal=True, **kw
    ).collect()
    assert (no_self[0].rid, no_self[0].edit_dist) == (8, 1)


def test_best_match_no_candidates_gives_no_row(spark):
    left = spark.createDataFrame([(1, "zzzzzz")], "lid long, lname string")
    right = spark.createDataFrame([(2, "bolt")], "rid long, rname string")
    out = fuzzy_best_match(
        left,
        right,
        left_name="lname",
        right_name="rname",
        left_id="lid",
        right_id="rid",
        left_block=[F.lit(1)],
        right_block=[F.lit(1)],
        max_dist=2,
    )
    assert out.count() == 0


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, name string")
    pairs = fuzzy_pairs_blocked(
        df,
        name_col="name",
        id_col="id",
        block_exprs=[F.substring("name", 1, 1)],
        max_dist=2,
    )
    assert pairs.count() == 0


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs
# ---------------------------------------------------------------------------


def test_snm_pairs_within_window(spark):
    from legendary_data_pipeline_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "apple"), (2, "apply"), (3, "appty"), (4, "azzzz"), (5, "berry")],
        "id long, name string",
    )
    pairs = sorted_neighborhood_pairs(
        df, sort_expr=F.col("name"), id_col="id", window=2
    )
    got = {(r.id_a, r.id_b): r.gap for r in pairs.collect()}
    # bucket 'a' sort order: apple(1) apply(2) appty(3) azzzz(4)
    assert got == {
        (1, 2): 1, (1, 3): 2,
        (2, 3): 1, (2, 4): 2,
        (3, 4): 1,
    }
    # 'berry' is a different first-char bucket: never paired
    assert not any(5 in p for p in got)


def test_snm_window_one_is_adjacent_only(spark):
    from legendary_data_pipeline_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "aa"), (2, "ab"), (3, "ac")], "id long, name string"
    )
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, sort_expr=F.col("name"), id_col="id", window=1
        ).collect()
    }
    assert got == {(1, 2), (2, 3)}


def test_snm_custom_bucket_spans_more(spark):
    from legendary_data_pipeline_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "apple"), (2, "berry")], "id long, name string"
    )
    # default first-char buckets: no pairs; a constant bucket pairs them
    assert (
        sorted_neighborhood_pairs(
            df, sort_expr=F.col("name"), id_col="id", window=1
        ).count()
        == 0
    )
    got = sorted_neighborhood_pairs(
        df,
        sort_expr=F.col("name"),
        id_col="id",
        window=1,
        bucket_expr=F.lit("all"),
    ).collect()
    assert [(r.id_a, r.id_b, r.gap) for r in got] == [(1, 2, 1)]
