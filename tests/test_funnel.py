"""Ordered funnel + retention cohorts: semantics on constructed events.

Engine parity runs in the oracle harness; these pin the CONTRACT:
ordering (later steps strictly after earlier ones), the conversion
window anchored at step 1, and cohort/day-offset arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.funnel import (
    NANOS_PER_DAY,
    funnel_report,
    funnel_times,
    retention_cohorts,
)

H = 3600  # 1 h conversion window


def _events(spark, rows):
    # rows: (user_id, seconds, event_type)
    df = spark.createDataFrame(rows, "user_id long, s long, event_type string")
    return df.select(
        "user_id", (F.col("s") * 1_000_000_000).alias("ts"), "event_type"
    )


def test_funnel_ordering_and_window(spark):
    ev = _events(
        spark,
        [
            # user 1: full conversion inside the window
            (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
            # user 2: click BEFORE the first view -> step 2 not reached
            (2, 200, "click"), (2, 300, "view"),
            # user 3: click after view but OUTSIDE the 1 h window
            (3, 100, "view"), (3, 100 + H + 1, "click"),
            # user 4: purchase before click -> step 3 not reached
            (4, 100, "view"), (4, 400, "purchase"), (4, 500, "click"),
            # user 5: never views -> not in the funnel at all
            (5, 100, "click"), (5, 200, "purchase"),
        ],
    )
    t = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_times(ev, ["view", "click", "purchase"], H).collect()
    }
    ns = 1_000_000_000
    assert t[1] == (100 * ns, 200 * ns, 300 * ns)
    assert t[2] == (300 * ns, None, None)
    assert t[3] == (100 * ns, None, None)
    assert t[4] == (100 * ns, 500 * ns, None)  # purchase@400 < click@500
    assert 5 not in t

    report = {
        r["step_idx"]: (r["step"], r["n_users"], r["conversion"])
        for r in funnel_report(ev, ["view", "click", "purchase"], H).collect()
    }
    assert report[1] == ("view", 4, 1.0)
    assert report[2] == ("click", 2, 0.5)
    assert report[3] == ("purchase", 1, 0.25)


def test_funnel_first_touch_anchoring(spark):
    # The window anchors at the FIRST view; a later view that would
    # have converted does not re-anchor (first-touch convention).
    ev = _events(
        spark,
        [(1, 0, "view"), (1, 2 * H, "view"), (1, 2 * H + 10, "click")],
    )
    rows = funnel_times(ev, ["view", "click"], H).collect()
    assert rows[0]["t1"] == 0 and rows[0]["t2"] is None


def test_retention_cohort_math(spark):
    d = NANOS_PER_DAY
    ev = (
        spark.createDataFrame(
            [
                # cohort day 0: users 1,2 — user 1 returns day 1 and 7,
                # user 2 never returns
                (1, 0), (1, d + 5), (1, 7 * d),
                (2, 10),
                # cohort day 3: user 3, returns day 4 (offset 1)
                (3, 3 * d), (3, 4 * d),
            ],
            "user_id long, ts long",
        )
    )
    got = {
        (r["cohort_day"], r["day_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in retention_cohorts(ev).collect()
    }
    assert got[("1970-01-01", 0)] == (2, 2, 1.0)
    assert got[("1970-01-01", 1)] == (1, 2, 0.5)
    assert got[("1970-01-01", 7)] == (1, 2, 0.5)
    assert got[("1970-01-04", 0)] == (1, 1, 1.0)
    assert got[("1970-01-04", 1)] == (1, 1, 1.0)
    # offsets with no activity emit no row (sparse matrix)
    assert ("1970-01-01", 3) not in got


def test_event_transitions_matrix(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, 100, "a"), (1, 2, 200, "b"), (1, 3, 300, "a"),
            (2, 4, 100, "a"), (2, 5, 200, "b"),
            # tie on ts broken by event_id: 6 -> 7 gives (a, c)
            (3, 6, 100, "a"), (3, 7, 100, "c"),
        ],
        "user_id long, event_id long, ts long, event_type string",
    )
    from legendary_data_pipeline_spark.operators.funnel import (
        event_transitions,
    )

    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
        for r in event_transitions(ev).collect()
    }
    # from 'a': 2x a->b, 1x a->c; from 'b': 1x b->a
    assert got[("a", "b")] == (2, 2.0 / 3.0)
    assert got[("a", "c")] == (1, 1.0 / 3.0)
    assert got[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in got  # last event of user 3 has no successor
