"""Batch/stream parity for the stateful EWMA anomaly scorer
(streaming/anomaly.py vs operators/stats.py `ewma_anomalies`)."""

from __future__ import annotations

import pytest

from legendary_data_pipeline_spark.operators.stats import ewma_anomalies
from legendary_data_pipeline_spark.streaming.anomaly import (
    ewma_anomaly_stream,
    run_ewma_anomaly_once,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, ts long, t long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_matches_batch_in_order(spark, tmp_path):
    # three users, in-order series with spikes and partial heads
    rows = []
    for u in (1, 2, 3):
        for t in range(12):
            v = 100 * u if t != 7 else 100 * u * 50
            rows.append((u, (t + 1) * 1_000_000_000, t, v))
    src = str(tmp_path / "events_in")
    _write_events(spark, src, rows)

    target = str(tmp_path / "scored")
    run_ewma_anomaly_once(
        spark, src, target, str(tmp_path / "ckpt"), k=4
    )
    got = {
        (r.user_id, r.t): (r.v, r.ewma, r.resid)
        for r in spark.read.parquet(target).collect()
    }

    batch_df = spark.createDataFrame(
        [(u, t, v) for (u, _ts, t, v) in rows],
        "user_id long, t long, v long",
    )
    expected = {
        (r.user_id, r.t): (r.v, r.ewma, r.resid)
        for r in ewma_anomalies(
            batch_df, "t", "v", group_cols=["user_id"], k=4
        ).collect()
    }
    assert got == expected  # bit-identical ewma/resid, NULL heads too


def test_stream_state_is_bounded_and_idempotent(spark, tmp_path):
    rows = [(1, (t + 1) * 1_000_000_000, t, t * 10) for t in range(30)]
    src = str(tmp_path / "events_in")
    _write_events(spark, src, rows)
    target = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    run_ewma_anomaly_once(spark, src, target, ckpt, k=3)
    n1 = spark.read.parquet(target).count()
    assert n1 == 30
    # drain again with no new files: no duplicate emissions
    run_ewma_anomaly_once(spark, src, target, ckpt, k=3)
    assert spark.read.parquet(target).count() == 30


def test_stream_k_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        ewma_anomaly_stream(None, k=0)


def test_cross_batch_late_point_inserts_by_event_time(spark, tmp_path):
    """Round-10 advice: a point arriving late across micro-batches used
    to append as the NEWEST buffer value — future baselines treated the
    stale point as lag 1. It now inserts by t: scored against the
    retained values preceding it in event time, and subsequent points
    see an event-time-ordered buffer."""
    src = str(tmp_path / "events_in")
    target = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    # drain 1: t = 0,1,2 with v = 10,20,30
    _write_events(
        spark, src,
        [(1, 1_000_000_000, 0, 10), (1, 2_000_000_000, 1, 20),
         (1, 3_000_000_000, 2, 30)],
    )
    run_ewma_anomaly_once(spark, src, target, ckpt, k=4)
    # drain 2 (new file): a LATE point t=1.5 → inserts between, then an
    # in-order point t=3 whose lag-1 must be v(t=2)=30, not the late 99
    import glob
    import shutil

    late_dir = str(tmp_path / "late")
    _write_events(
        spark, late_dir,
        # late point modeled at t=1 (duplicate index, ties after) —
        # series index is int; use t=1 tie and t=3 follower
        [(1, 1_500_000_000, 1, 99), (1, 4_000_000_000, 3, 40)],
    )
    for f in glob.glob(late_dir + "/*.parquet"):
        shutil.copy(f, src + "/late-" + f.rsplit("/", 1)[1])
    run_ewma_anomaly_once(spark, src, target, ckpt, k=4)
    got = {
        (r.t, r.v): (r.ewma, r.resid)
        for r in spark.read.parquet(target).collect()
    }
    # late (t=1, v=99): preceded in event time by t=0 (10) and the
    # first t=1 (20) — ewma = (10*4 + 20*8)/12 = 200/12
    assert got[(1, 99)][0] == pytest.approx(200.0 / 12.0)
    # t=3 scored against event-time-ordered lags [10, 20, 99, 30]:
    # ewma = (10*1 + 20*2 + 99*4 + 30*8)/15 = 686/15 — the late 99 sits
    # at lag 2, NOT lag 1 (the pre-fix arrival-order buffer gave 99
    # weight 8 → 838/15)
    assert got[(3, 40)][0] == pytest.approx(686.0 / 15.0)


def test_only_late_events_batch_does_not_crash_timeout(spark, tmp_path):
    """Round-10 advice flagged setTimeoutTimestamp(last_event + idle)
    as crash-prone when a micro-batch holds ONLY events older than
    watermark - idle (timeout ≤ watermark → IllegalArgumentException,
    checkpoint poisoned). Empirically (this test, Spark 4):
    applyInPandasWithState drops sub-watermark rows BEFORE the state
    function, so such a batch never reaches user code — the ancient
    event is silently discarded, no crash, no emission. The
    watermark+1 clamp stays in anomaly.py as defense-in-depth (it
    costs one max(); it matters for idle_timeout_ms=0 or an engine
    version without the pre-filter); this test pins the engine's
    late-row drop so a behavior change surfaces here, not as a
    poisoned production checkpoint."""
    src = str(tmp_path / "events_in")
    target = str(tmp_path / "scored")
    ckpt = str(tmp_path / "ckpt")
    day = 24 * 3600
    # drain 1: advance the watermark far ahead (watermark delay 1h)
    _write_events(spark, src, [(1, 30 * day * 1_000_000_000, 0, 10)])
    run_ewma_anomaly_once(
        spark, src, target, ckpt, k=2, idle_timeout_ms=60_000
    )
    # drain 2: a different key whose ONLY event is ancient — with a 60 s
    # idle timeout, last_ms + idle is ~30 days below the watermark
    import glob
    import shutil

    late_dir = str(tmp_path / "late")
    _write_events(spark, late_dir, [(2, 1 * 1_000_000_000, 0, 5)])
    for f in glob.glob(late_dir + "/*.parquet"):
        shutil.copy(f, src + "/late-" + f.rsplit("/", 1)[1])
    # the drain must complete (no StreamingQueryException); the ancient
    # row is dropped by the engine's pre-state late filter
    run_ewma_anomaly_once(
        spark, src, target, ckpt, k=2, idle_timeout_ms=60_000
    )
    got = {(r.user_id, r.t) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 0)}


def test_stream_null_rows_dropped_not_poisonous(spark, tmp_path):
    """Round-10 review regression: a NULL v row reached the pandas
    state fn as NaN and int(NaN) crashed the stream (and every
    checkpoint restart). NULLs now drop pre-state, matching the batch
    operator's .where contract."""
    rows = [(1, 1_000_000_000, 0, 10), (1, 2_000_000_000, 1, None),
            (1, 3_000_000_000, 2, 30)]
    src = str(tmp_path / "events_in")
    spark.createDataFrame(
        rows, "user_id long, ts long, t long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "scored")
    run_ewma_anomaly_once(
        spark, src, target, str(tmp_path / "ckpt"), k=2
    )
    got = {r.t: r for r in spark.read.parquet(target).collect()}
    assert set(got) == {0, 2}  # the NULL row emitted nothing
    # t=2's baseline uses only t=0 (the NULL row contributed no lag)
    assert got[2].ewma == 10.0
