#!/usr/bin/env python
"""Round-16 conf experiment for the streaming parities (VERDICT #3).

Two axes, measured on the streaming-run phase only (staging excluded):

1. state/shuffle partition width — r15 A/B'd 8 vs 2 and found the
   Python-state parities compute-bound (8 beat 2 by ~2x); this probe
   extends the sweep UP (8/16/32) for the Python-state parities
   (ewma, sessions) and re-checks 2 vs 8 for the foreachBatch monitors
   (psi, quality).
2. scratch placement — /tmp (ext4 on this box) vs /dev/shm (tmpfs) for
   the parity's staging root (checkpoint + state store + sink), at the
   per-parity best width.

Probe-only; run SERIAL. Alternate arms to cancel box drift.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from legendary_data_pipeline_spark import queries as _q  # noqa: E402,F401
from legendary_data_pipeline_spark.catalog import load_table  # noqa: E402
from legendary_data_pipeline_spark.queries_streaming import (  # noqa: E402
    _EWMA_K,
    _NEVER_LATE,
    _SESSION_GAP_S,
    _STAGED_SCHEMA,
    _quality_checks,
    _split_days,
    _stage_events,
    _stage_ordered_files,
)
from legendary_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage_ewma(spark, root):
    ev, mid = _split_days(spark, SF_DIR)
    cents = F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
    daily = (
        ev.groupBy("user_id", F.expr("ts DIV 86400000000000").alias("t"))
        .agg(F.sum(cents).cast("long").alias("v"))
        .select(
            "user_id",
            (F.col("t") * F.lit(86_400_000_000_000)).cast("long").alias("ts"),
            "t",
            "v",
        )
    )
    return _stage_ordered_files(
        spark,
        [daily.filter(F.col("t") < mid), daily.filter(F.col("t") >= mid)],
        root,
    )


def stage_sessions(spark, root):
    ev, mid = _split_days(spark, SF_DIR)
    cents = F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
    d = F.expr("ts DIV 86400000000000")
    staged = ev.select(
        "event_id",
        F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        cents.cast("double").alias("value"),
        "props",
        d.alias("__d"),
    )
    parts = [
        staged.filter(F.col("__d") < mid).drop("__d"),
        staged.filter(F.col("__d") >= mid).drop("__d"),
    ]
    return _stage_ordered_files(spark, parts, root)


def run_ewma(spark, staging, root):
    from legendary_data_pipeline_spark.streaming.anomaly import (
        run_ewma_anomaly_once,
    )

    run_ewma_anomaly_once(
        spark, staging, f"{root}/out", f"{root}/ckpt",
        k=_EWMA_K, watermark=_NEVER_LATE, max_files_per_trigger=1,
    )


def run_sessions(spark, staging, root):
    from legendary_data_pipeline_spark.streaming.sessions import (
        run_sessionize_once,
    )

    run_sessionize_once(
        spark, staging, f"{root}/out", f"{root}/ckpt",
        gap_seconds=_SESSION_GAP_S, watermark=_NEVER_LATE,
        max_files_per_trigger=1,
    )


def run_quality(spark, staging, root):
    from legendary_data_pipeline_spark.streaming.quality import (
        run_quality_monitor_once,
    )

    run_quality_monitor_once(
        spark, staging, _STAGED_SCHEMA, f"{root}/report", f"{root}/ckpt",
        _quality_checks(), max_files_per_trigger=1,
    )


def make_run_psi(baseline):
    def run_psi(spark, staging, root):
        from legendary_data_pipeline_spark.streaming.quality import (
            run_psi_monitor_once,
        )

        run_psi_monitor_once(
            spark, staging, _STAGED_SCHEMA, baseline, "event_type",
            f"{root}/report", f"{root}/ckpt",
            max_files_per_trigger=1, scaled_e6=True,
        )

    return run_psi


def stage_psi(spark, root, ev):
    d = F.expr("ts DIV 86400000000000")
    lo, hi = ev.agg(F.min(d), F.max(d)).first()
    mid = (int(lo) + int(hi) + 1) // 2
    return _stage_ordered_files(
        spark, [ev.filter(d < mid), ev.filter(d >= mid)], root
    )


def main():
    spark = get_spark(
        app_name="probe-stream-r16",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def __warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    spark.range(1000).select(__warm(F.col("id").cast("double"))).write.format(
        "noop"
    ).mode("overwrite").save()

    ev_cached = load_table(spark, SF_DIR, "events").persist()
    ev_cached.count()

    cases = {
        "ewma": (stage_ewma, run_ewma, ("8", "16", "32")),
        "sessions": (stage_sessions, run_sessions, ("8", "16", "32")),
        "psi": (
            lambda s, r: stage_psi(s, r, ev_cached),
            make_run_psi(ev_cached),
            ("8", "2"),
        ),
        "quality": (
            lambda s, r: _stage_events(s, SF_DIR, r),
            run_quality,
            ("8", "2"),
        ),
    }
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[tuple, list[float]] = {}
    scratches = ["/tmp"]
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        scratches.append("/dev/shm")
    for rep in range(2):
        for name, (stage, run, widths) in cases.items():
            for scratch in scratches:
                for w in widths:
                    root = tempfile.mkdtemp(
                        prefix=f"probe16_{name}_", dir=scratch
                    )
                    spark.conf.set("spark.sql.shuffle.partitions", w)
                    staging = stage(spark, root)
                    t0 = time.perf_counter()
                    run(spark, staging, root)
                    dt = time.perf_counter() - t0
                    key = (name, scratch, w)
                    results.setdefault(key, []).append(dt)
                    print(
                        f"rep{rep} {name} scratch={scratch} width={w}: "
                        f"{dt:.2f}s",
                        flush=True,
                    )
                    spark.conf.set("spark.sql.shuffle.partitions", prior)
                    shutil.rmtree(root, ignore_errors=True)
    print("\n=== min-of-reps ===")
    for key in sorted(results):
        name, scratch, w = key
        print(f"{name:9s} scratch={scratch:9s} width={w:>2s}: "
              f"{min(results[key]):.2f}s  (runs: "
              + ", ".join(f"{v:.2f}" for v in results[key]) + ")")
    ev_cached.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
