"""SCD Type-2 contracts: episode merging, last-writer-wins, half-open
intervals, point-in-time reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.scd import (
    scd2_from_changelog,
    scd2_snapshot_at,
)


def _log(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, state string")


def test_episodes_merge_and_intervals_chain(spark):
    log = _log(
        spark,
        [
            ("u1", 10, "a"),
            ("u1", 20, "a"),   # same state — merges into episode 1
            ("u1", 30, "b"),
            ("u1", 40, "a"),   # back to a — NEW episode, not merged
        ],
    )
    out = sorted(
        scd2_from_changelog(log, ["k"], "t", ["state"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["state"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("a", 10, 30),
        ("b", 30, 40),
        ("a", 40, None),
    ]
    assert [r["is_current"] for r in out] == [False, False, True]


def test_last_writer_wins_within_timestamp(spark):
    log = _log(spark, [("u1", 10, "a"), ("u1", 10, "z"), ("u1", 20, "z")])
    out = scd2_from_changelog(log, ["k"], "t", ["state"]).collect()
    # max(struct) picks 'z' at t=10; t=20 'z' merges → ONE episode
    assert len(out) == 1
    r = out[0]
    assert (r["state"], r["valid_from"], r["valid_to"], r["is_current"]) == (
        "z", 10, None, True
    )


def test_null_keys_and_ts_dropped_null_attr_is_state(spark):
    log = _log(
        spark,
        [
            ("u1", 10, "a"),
            (None, 20, "b"),
            ("u1", None, "c"),
            ("u1", 30, None),  # NULL state is a real episode
            ("u1", 40, None),  # merges with it (null-safe compare)
        ],
    )
    out = sorted(
        scd2_from_changelog(log, ["k"], "t", ["state"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert len(out) == 2
    assert out[1]["state"] is None
    assert out[1]["valid_from"] == 30 and out[1]["is_current"] is True


def test_snapshot_at_reconstructs_past(spark):
    log = _log(
        spark,
        [("u1", 10, "a"), ("u1", 30, "b"), ("u2", 5, "x")],
    )
    scd2 = scd2_from_changelog(log, ["k"], "t", ["state"])
    at25 = {
        r["k"]: r["state"]
        for r in scd2_snapshot_at(scd2, F.lit(25)).collect()
    }
    assert at25 == {"u1": "a", "u2": "x"}
    # half-open boundary: at exactly t=30 the NEW state holds
    at30 = {
        r["k"]: r["state"]
        for r in scd2_snapshot_at(scd2, F.lit(30)).collect()
    }
    assert at30["u1"] == "b"
    # before any history: nothing for u1
    at7 = {
        r["k"]: r["state"]
        for r in scd2_snapshot_at(scd2, F.lit(7)).collect()
    }
    assert at7 == {"u2": "x"}


def test_multi_key_multi_attr(spark):
    log = spark.createDataFrame(
        [
            ("a", 1, 10, "s1", 5),
            ("a", 1, 20, "s1", 5),   # identical attrs merge
            ("a", 1, 30, "s1", 6),   # attr2 change splits
            ("a", 2, 10, "s9", 1),   # different key
        ],
        "k1 string, k2 long, t long, s string, v long",
    )
    out = scd2_from_changelog(log, ["k1", "k2"], "t", ["s", "v"]).collect()
    by = {}
    for r in out:
        by.setdefault((r["k1"], r["k2"]), []).append(r)
    assert len(by[("a", 1)]) == 2
    assert len(by[("a", 2)]) == 1
    ep = sorted(by[("a", 1)], key=lambda r: r["valid_from"])
    assert (ep[0]["v"], ep[0]["valid_to"]) == (5, 30)
    assert (ep[1]["v"], ep[1]["is_current"]) == (6, True)


def test_apply_incremental_equals_full_rebuild(spark):
    from legendary_data_pipeline_spark.operators.scd import scd2_apply_changelog

    full = _log(
        spark,
        [
            ("u1", 10, "a"), ("u1", 30, "b"), ("u1", 50, "c"),
            ("u2", 15, "x"), ("u2", 45, "y"),
        ],
    )
    batch1 = full.filter(F.col("t") <= 30)
    batch2 = full.filter(F.col("t") > 30)
    base = scd2_from_changelog(batch1, ["k"], "t", ["state"])
    incr = scd2_apply_changelog(base, batch2, ["k"], "t", ["state"])
    rebuilt = scd2_from_changelog(full, ["k"], "t", ["state"])
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_apply_late_change_splices_history(spark):
    from legendary_data_pipeline_spark.operators.scd import scd2_apply_changelog

    base = scd2_from_changelog(
        _log(spark, [("u1", 10, "a"), ("u1", 50, "c")]),
        ["k"], "t", ["state"],
    )
    # a LATE event lands between the existing episodes
    late = _log(spark, [("u1", 30, "b")])
    out = sorted(
        scd2_apply_changelog(base, late, ["k"], "t", ["state"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["state"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("a", 10, 30), ("b", 30, 50), ("c", 50, None),
    ]


def test_apply_redundant_change_does_not_fragment(spark):
    from legendary_data_pipeline_spark.operators.scd import scd2_apply_changelog

    base = scd2_from_changelog(
        _log(spark, [("u1", 10, "a")]), ["k"], "t", ["state"]
    )
    # new event reports the SAME state later — history must stay 1 episode
    out = scd2_apply_changelog(
        base, _log(spark, [("u1", 40, "a")]), ["k"], "t", ["state"]
    ).collect()
    assert len(out) == 1
    assert out[0]["valid_from"] == 10 and out[0]["is_current"] is True


def test_apply_bootstrap_from_empty(spark):
    from legendary_data_pipeline_spark.operators.scd import scd2_apply_changelog

    empty = scd2_from_changelog(
        _log(spark, []).filter(F.lit(False)), ["k"], "t", ["state"]
    )
    out = scd2_apply_changelog(
        empty, _log(spark, [("u1", 10, "a")]), ["k"], "t", ["state"]
    ).collect()
    assert len(out) == 1 and out[0]["is_current"] is True
