"""asof_join direction semantics on hand-built frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c")],
        "k int, lt long, lpay string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 20, "r20"), (1, 30, "r30"), (2, 50, "r50")],
        "k int, rt long, rpay string",
    )
    return left, right


def _rows(df):
    return {(r["k"], r["lt"]): (r["rpay"], r["rt"]) for r in df.collect()}


def test_backward_latest_at_or_before(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(left, right, ["k"], "lt", "rt", ["rpay", "rt"])
    )
    assert got == {
        (1, 10): ("r10", 10),   # inclusive at equal ts
        (1, 25): ("r20", 20),
        (2, 5): (None, None),   # nothing at or before
    }


def test_forward_earliest_at_or_after(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(
            left, right, ["k"], "lt", "rt", ["rpay", "rt"],
            direction="forward",
        )
    )
    assert got == {
        (1, 10): ("r10", 10),   # inclusive at equal ts
        (1, 25): ("r30", 30),
        (2, 5): ("r50", 50),
    }


def test_nearest_picks_closer_side_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, 12), (1, 18), (1, 25), (2, 5)], "k int, lt long"
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 20, "r20"), (2, 50, "r50")],
        "k int, rt long, rpay string",
    )
    got = {
        (r["k"], r["lt"]): (r["rpay"], r["rt"])
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["rpay", "rt"],
            direction="nearest",
        ).collect()
    }
    assert got == {
        (1, 12): ("r10", 10),   # back dist 2 < fwd dist 8
        (1, 18): ("r20", 20),   # fwd dist 2 < back dist 8
        (1, 25): ("r20", 20),   # no forward candidate -> backward
        (2, 5): ("r50", 50),    # no backward candidate -> forward
    }


def test_nearest_equidistant_prefers_backward(spark):
    left = spark.createDataFrame([(1, 15)], "k int, lt long")
    right = spark.createDataFrame(
        [(1, 10, "back"), (1, 20, "fwd")], "k int, rt long, rpay string"
    )
    got = asof_join(
        left, right, ["k"], "lt", "rt", ["rpay"], direction="nearest"
    ).collect()
    assert [r["rpay"] for r in got] == ["back"]


def test_direction_validation(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction must be"):
        asof_join(
            left, right, ["k"], "lt", "rt", ["rpay"], direction="sideways"
        )


def test_forward_tiebreak_dedups_equal_ts(spark):
    left = spark.createDataFrame([(1, 10)], "k int, lt long")
    right = spark.createDataFrame(
        [(1, 20, "low"), (1, 20, "high")], "k int, rt long, rpay string"
    )
    got = asof_join(
        left, right, ["k"], "lt", "rt", ["rpay"],
        right_tiebreak=F.col("rpay"),
        direction="forward",
    ).collect()
    assert [r["rpay"] for r in got] == ["low"]


def test_nearest_rejects_non_numeric_ts(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:15")], "k int, lt string"
    ).select("k", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10", "r")], "k int, rt string, rpay string"
    ).select("k", F.col("rt").cast("timestamp"), "rpay")
    with pytest.raises(TypeError, match="numeric"):
        asof_join(
            left, right, ["k"], "lt", "rt", ["rpay"], direction="nearest"
        )
    # backward/forward are ordering-only: timestamps remain fine there.
    got = asof_join(
        left, right, ["k"], "lt", "rt", ["rpay"], direction="backward"
    ).collect()
    assert [r["rpay"] for r in got] == ["r"]
