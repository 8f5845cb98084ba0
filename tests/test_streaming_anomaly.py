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
