#!/usr/bin/env python
"""Phase-level timing probe for the streaming parity queries (r15 opt).

Replicates each parity callable's body with per-phase timers so the
optimization round knows whether the seconds go to staging jobs, the
streaming run itself, or readback. Probe-only tool — the registered
queries are untouched. Run SERIAL (NOTES probe-hygiene rule).

Mirrors the CURRENT (r15-optimized) callable bodies: single-pass
staging, persisted split parents, cached PSI baseline, per-parity
tiny-state partition widths.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from legendary_data_pipeline_spark import queries as _q  # noqa: E402,F401 — registry first (partial-import guard)
from legendary_data_pipeline_spark.catalog import load_table  # noqa: E402
from legendary_data_pipeline_spark.queries_streaming import (  # noqa: E402
    _EWMA_K,
    _NEVER_LATE,
    _SESSION_GAP_S,
    _STAGED_SCHEMA,
    _parity_run,
    _read_staged_stream,
    _stage_events,
    _stage_ordered_files,
)
from legendary_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.marks = []

    def mark(self, label):
        now = time.perf_counter()
        self.marks.append((label, now - self.t0))
        self.t0 = now

    def report(self, name):
        total = sum(d for _, d in self.marks)
        print(f"--- {name}: total {total:.2f}s")
        for label, d in self.marks:
            print(f"    {d:6.2f}s  {label}")


def probe_ewma(spark):
    from legendary_data_pipeline_spark.streaming.anomaly import (
        run_ewma_anomaly_once,
    )

    t = T()
    with _parity_run(spark, "probe_ewma_") as root:
        ev = load_table(spark, SF_DIR, "events")
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
            .persist()
        )
        try:
            lo, hi = daily.agg(F.min("t"), F.max("t")).first()
            mid = (int(lo) + int(hi) + 1) // 2
            t.mark("daily agg + min/max (cache populate)")
            staging = _stage_ordered_files(
                spark,
                [daily.filter(F.col("t") < mid), daily.filter(F.col("t") >= mid)],
                root,
            )
            t.mark("stage_ordered_files (single pass)")
            target, ckpt = f"{root}/out", f"{root}/ckpt"
            run_ewma_anomaly_once(
                spark, staging, target, ckpt,
                k=_EWMA_K, watermark=_NEVER_LATE, max_files_per_trigger=1,
            )
            t.mark("streaming run (2 micro-batches)")
        finally:
            daily.unpersist()
    out = spark.read.parquet(target).select("user_id", "t", "v", "ewma", "resid")
    out.write.format("noop").mode("overwrite").save()
    t.mark("readback + noop")
    t.report("stream_ewma_parity")


def probe_sessions(spark):
    from legendary_data_pipeline_spark.streaming.sessions import (
        run_sessionize_once,
    )

    t = T()
    with _parity_run(spark, "probe_sess_") as root:
        ev = load_table(spark, SF_DIR, "events")
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
        ).persist()
        try:
            lo, hi = staged.agg(F.min("__d"), F.max("__d")).first()
            mid = (int(lo) + int(hi) + 1) // 2
            t.mark("projection + min/max (cache populate)")
            parts = [
                staged.filter(F.col("__d") < mid).drop("__d"),
                staged.filter(F.col("__d") >= mid).drop("__d"),
            ]
            staging = _stage_ordered_files(spark, parts, root)
            t.mark("stage_ordered_files (single pass)")
            target, ckpt = f"{root}/out", f"{root}/ckpt"
            run_sessionize_once(
                spark, staging, target, ckpt,
                gap_seconds=_SESSION_GAP_S, watermark=_NEVER_LATE,
                max_files_per_trigger=1,
            )
            t.mark("streaming run")
        finally:
            staged.unpersist()
    out = spark.read.parquet(target).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value").cast("long").alias("total_cents"),
    )
    out.write.format("noop").mode("overwrite").save()
    t.mark("readback + noop")
    t.report("stream_session_parity")


def probe_psi(spark):
    from legendary_data_pipeline_spark.streaming.quality import (
        run_psi_monitor_once,
    )

    t = T()
    with _parity_run(spark, "probe_psi_") as root:
        ev = load_table(spark, SF_DIR, "events").persist()
        try:
            d = F.expr("ts DIV 86400000000000")
            lo, hi = ev.agg(F.min(d), F.max(d)).first()
            mid = (int(lo) + int(hi) + 1) // 2
            t.mark("min/max (cache populate)")
            staging = _stage_ordered_files(
                spark, [ev.filter(d < mid), ev.filter(d >= mid)], root
            )
            t.mark("stage_ordered_files (single pass)")
            report, ckpt = f"{root}/report", f"{root}/ckpt"
            run_psi_monitor_once(
                spark, staging, _STAGED_SCHEMA, ev, "event_type",
                report, ckpt, max_files_per_trigger=1, scaled_e6=True,
            )
            t.mark("streaming run")
        finally:
            ev.unpersist()
    out = spark.read.parquet(report).select(
        "batch_id", "value", "n_base", "n_current",
        "p_base_e6", "p_current_e6", "psi_term_e6", "psi_e6", "alert",
    )
    out.write.format("noop").mode("overwrite").save()
    t.mark("readback + noop")
    t.report("stream_psi_parity")


def probe_attr(spark):
    from legendary_data_pipeline_spark.streaming.attribution import (
        attribute_purchases,
        split_clicks_purchases,
    )

    t = T()
    with _parity_run(spark, "probe_attr_", partitions="2") as root:
        staging = _stage_events(spark, SF_DIR, root)
        t.mark("stage_events (repartition 2 write)")
        target, ckpt = f"{root}/out", f"{root}/ckpt"
        clicks, purchases = split_clicks_purchases(_read_staged_stream(spark, staging))
        pairs = attribute_purchases(
            clicks, purchases, horizon_minutes=60, watermark=_NEVER_LATE
        )
        q = (
            pairs.writeStream.outputMode("append")
            .format("parquet")
            .option("path", target)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t.mark("streaming run")
    out = spark.read.parquet(target).select(
        "purchase_event_id", "click_event_id", "user_id", "lag_us"
    )
    out.write.format("noop").mode("overwrite").save()
    t.mark("readback + noop")
    t.report("stream_attribution_parity")


def probe_quality(spark):
    from legendary_data_pipeline_spark.queries_streaming import _quality_checks
    from legendary_data_pipeline_spark.streaming.quality import (
        run_quality_monitor_once,
    )

    t = T()
    with _parity_run(spark, "probe_dq_") as root:
        staging = _stage_events(spark, SF_DIR, root)
        t.mark("stage_events")
        report, ckpt = f"{root}/report", f"{root}/ckpt"
        run_quality_monitor_once(
            spark, staging, _STAGED_SCHEMA, report, ckpt,
            _quality_checks(), max_files_per_trigger=1,
        )
        t.mark("streaming run")
    rep = spark.read.parquet(report)
    out = (
        rep.groupBy("check_name")
        .agg(
            F.countDistinct("batch_id").cast("long").alias("n_batches"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_violations").cast("long").alias("n_violations"),
        )
        .withColumn("passed", F.col("n_violations") == 0)
    )
    out.write.format("noop").mode("overwrite").save()
    t.mark("readback + noop")
    t.report("stream_quality_parity")


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="probe-stream-phases",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same generic warmups as bench.py so fixed JVM costs don't land on
    # the first probe
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def __warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    spark.range(1000).select(__warm(F.col("id").cast("double"))).write.format(
        "noop"
    ).mode("overwrite").save()

    which = sys.argv[1:] or ["ewma", "sessions", "psi", "attr", "quality"]
    fns = {
        "ewma": probe_ewma,
        "sessions": probe_sessions,
        "psi": probe_psi,
        "attr": probe_attr,
        "quality": probe_quality,
    }
    for name in which:
        fns[name](spark)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
