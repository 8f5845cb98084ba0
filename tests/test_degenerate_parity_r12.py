"""Degenerate-input oracle parity (r11 advice, fixed r12): the
complete-block rank family (friedman / page / kendalls_w) used to
aggregate n_blocks/k OUT of a frame that is empty when every block is
incomplete, emitting n_blocks=NULL where the DuckDB oracles' scalar
subqueries emit 0 and the INPUT-level k; cumulative_gains stacked one
all-NULL global-agg row into k NULL rows on empty input where the
oracle emits 0 rows. These tests pin the oracle convention.
"""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.hypotests import (
    friedman_test,
    kendalls_w,
    page_trend_test,
)
from legendary_data_pipeline_spark.operators.mleval import cumulative_gains

_BLOCK_SCHEMA = "b int, tr string, v long"


def _all_incomplete(spark):
    # 3 distinct treatments overall; every block holds only 1-2 of them
    return spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "b", 30), (3, "c", 5)],
        _BLOCK_SCHEMA,
    )


def test_block_family_all_incomplete_matches_oracle_zero(spark):
    df = _all_incomplete(spark)
    for fn in (friedman_test, page_trend_test, kendalls_w):
        (row,) = fn(df, "b", "tr", "v").collect()
        # oracle: n_blocks from a scalar COUNT(DISTINCT) over the empty
        # ranked frame = 0; k from the INPUT-level distinct treatments
        assert row["n_blocks"] == 0, fn.__name__
        assert row["k"] == 3, fn.__name__
        assert row["n_dropped_blocks"] == 3, fn.__name__
    assert friedman_test(df, "b", "tr", "v").collect()[0]["t"] is None
    prow = page_trend_test(df, "b", "tr", "v").collect()[0]
    assert prow["l2"] is None and prow["z_e6"] is None
    assert kendalls_w(df, "b", "tr", "v").collect()[0]["w"] is None


def test_block_family_fully_empty_input(spark):
    df = spark.createDataFrame([], _BLOCK_SCHEMA)
    for fn in (friedman_test, page_trend_test, kendalls_w):
        (row,) = fn(df, "b", "tr", "v").collect()
        # oracle: kk = COUNT(DISTINCT) over empty = 0; dropn's SUM over
        # zero blocks is NULL on both sides
        assert row["n_blocks"] == 0, fn.__name__
        assert row["k"] == 0, fn.__name__
        assert row["n_dropped_blocks"] is None, fn.__name__


def test_block_family_nondegenerate_unchanged(spark):
    # sanity pin that the restructure did not move the normal path:
    # 2 complete blocks + 1 incomplete, k = 3
    df = spark.createDataFrame(
        [
            (1, "a", 10), (1, "b", 20), (1, "c", 30),
            (2, "a", 30), (2, "b", 20), (2, "c", 10),
            (3, "a", 1),
        ],
        _BLOCK_SCHEMA,
    )
    (frow,) = friedman_test(df, "b", "tr", "v").collect()
    assert (frow["n_blocks"], frow["k"], frow["n_dropped_blocks"]) == (2, 3, 1)
    # perfectly opposed blocks: rank sums all equal -> S = 0 -> W = 0
    (wrow,) = kendalls_w(df, "b", "tr", "v").collect()
    assert wrow["w"] == 0.0
    (prow,) = page_trend_test(df, "b", "tr", "v").collect()
    # doubled rank sums per treatment: a: 2+6=8, b: 4+4=8, c: 6+2=8
    # L2 = 1*8 + 2*8 + 3*8 = 48
    assert prow["l2"] == 48


def test_cumulative_gains_empty_input_zero_rows(spark):
    df = spark.createDataFrame([], "p double, y long")
    out = cumulative_gains(df, "p", "y")
    assert out.count() == 0
    # schema survives the empty gate
    assert out.columns == [
        "point", "frac_rows", "target_rows", "n_kept", "pos_kept",
        "gain", "lift",
    ]


def test_cumulative_gains_all_null_input_zero_rows(spark):
    df = spark.createDataFrame(
        [(None, None), (None, 1), (0.5, None)], "p double, y long"
    )
    # every row carries a NULL on one side, so the kept set is empty
    assert cumulative_gains(df, "p", "y").count() == 0
