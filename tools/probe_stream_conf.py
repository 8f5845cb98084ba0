#!/usr/bin/env python
"""Conf experiment for the streaming parities: vary the parity-scoped
shuffle-partition count (state-store instance count) and time JUST the
streaming run phase. Probe-only; run SERIAL."""

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
from legendary_data_pipeline_spark.queries_streaming import (  # noqa: E402
    _EWMA_K,
    _NEVER_LATE,
    _SESSION_GAP_S,
    _STAGED_SCHEMA,
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


def run_attr(spark, staging, root):
    from legendary_data_pipeline_spark.queries_streaming import (
        _read_staged_stream,
    )
    from legendary_data_pipeline_spark.streaming.attribution import (
        attribute_purchases,
        split_clicks_purchases,
    )

    clicks, purchases = split_clicks_purchases(_read_staged_stream(spark, staging))
    pairs = attribute_purchases(
        clicks, purchases, horizon_minutes=60, watermark=_NEVER_LATE
    )
    (
        pairs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def main():
    spark = get_spark(
        app_name="probe-stream-conf",
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

    cases = [
        ("ewma", stage_ewma, run_ewma),
        ("sessions", stage_sessions, run_sessions),
        ("attr", lambda s, r: _stage_events(s, SF_DIR, r), run_attr),
    ]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    for parts_n in ("8", "2", "8", "2"):  # alternate to cancel warm-up drift
        for name, stage, run in cases:
            root = tempfile.mkdtemp(prefix=f"probe_conf_{name}_")
            spark.conf.set("spark.sql.shuffle.partitions", parts_n)
            staging = stage(spark, root)
            t0 = time.perf_counter()
            run(spark, staging, root)
            dt = time.perf_counter() - t0
            print(f"{name} shuffle={parts_n}: stream run {dt:.2f}s", flush=True)
            spark.conf.set("spark.sql.shuffle.partitions", prior)
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
