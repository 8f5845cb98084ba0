"""Interval algebra contracts: merge semantics (overlap, touch, nest,
invalid spans) and coverage arithmetic."""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.intervals import (
    interval_coverage,
    merge_intervals,
)


def _spans(spark, rows):
    return spark.createDataFrame(rows, "k string, start long, end long")


def test_merge_overlap_touch_nest_and_gap(spark):
    spans = _spans(
        spark,
        [
            ("a", 1, 5), ("a", 4, 9),    # overlap → [1,9)
            ("a", 9, 12),                # touches → extends to [1,12)
            ("a", 2, 3),                 # nested — absorbed
            ("a", 20, 25),               # separate island
            ("b", 0, 10),
        ],
    )
    out = sorted(
        merge_intervals(spans, ["k"]).collect(),
        key=lambda r: (r["k"], r["start"]),
    )
    assert [(r["k"], r["start"], r["end"], r["n_source"]) for r in out] == [
        ("a", 1, 12, 4),
        ("a", 20, 25, 1),
        ("b", 0, 10, 1),
    ]


def test_merge_drops_invalid_and_null(spark):
    spans = _spans(
        spark,
        [
            ("a", 1, 5),
            ("a", 7, 7),      # empty span
            ("a", 9, 8),      # inverted
            ("a", None, 5),   # NULL endpoint
            (None, 1, 5),     # NULL key
        ],
    )
    out = merge_intervals(spans, ["k"]).collect()
    assert [(r["k"], r["start"], r["end"]) for r in out] == [("a", 1, 5)]


def test_coverage_arithmetic(spark):
    spans = _spans(
        spark,
        [("a", 0, 10), ("a", 5, 15), ("a", 30, 40), ("b", 2, 4)],
    )
    out = {r["k"]: r for r in interval_coverage(spans, ["k"]).collect()}
    # a: merged [0,15) + [30,40) → covered 25, span 40, gaps 15
    assert (
        out["a"]["n_spans"], out["a"]["covered"],
        out["a"]["span"], out["a"]["gaps"],
    ) == (2, 25, 40, 15)
    assert (
        out["b"]["n_spans"], out["b"]["covered"],
        out["b"]["span"], out["b"]["gaps"],
    ) == (1, 2, 2, 0)


def test_merge_partition_invariant(spark):
    rows = [("u", i * 3, i * 3 + 5) for i in range(200)]  # chain-merge all
    spans = _spans(spark, rows)
    a = merge_intervals(spans, ["k"]).collect()
    b = merge_intervals(spans.repartition(13), ["k"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 1 and a[0]["n_source"] == 200
