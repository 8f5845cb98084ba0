"""Shadow queries: Structured-Streaming parity readouts (X234–X237).

The streaming surface (streaming/*.py) replaces the reference's cron
re-runs (every reference script is a batch job re-run on a schedule —
e.g. 03_build_market_price_daily.js rebuilds the daily snapshot table
idempotently; SURVEY §2.9) with continuously-maintained tables. Until
round 14 that surface was pytest-only: batch-parity and replay
contracts, but never an independent driver-oracle row. These three
queries close that gap — each one EXECUTES a genuine Structured
Streaming job (Trigger.AvailableNow, multi-micro-batch via
maxFilesPerTrigger=1, real checkpoint + state store) inside the query
callable, then returns the maintained table for the driver to hash
against a plain batch-SQL oracle.

Determinism contract (what makes a streaming run oracle-pairable):

- input is a STAGED copy of the sf events table split into 2 parquet
  files, so the run genuinely crosses micro-batch boundaries (state
  carried across batches, upsert-by-key re-emission, cross-batch
  dedup state) — the semantics the parity is claiming;
- the watermark delay is set far beyond the fixture's event-time span
  ("3650 days" vs ~1 month of events), so NO row is ever
  watermark-late: late-drop behavior is load-order-dependent and
  therefore not SQL-replayable (the production entry points keep
  their real watermarks; tests/test_streaming.py covers eviction);
- every emitted aggregate is exact (count / sum / max over integer
  cents) — the HLL approx_unique_users column of the production
  rollup is excluded via include_approx_users=False;
- all outputs are aggregation-level, so file/partition assignment of
  the staged copy cannot affect values.

Each callable stages into a fresh mkdtemp (checkpoint, target, input)
— safe under concurrent/replayed driver invocation; the returned
DataFrame reads the written target, so driver-side re-collection is
stable. `_parity_run` scopes the tiny-state shuffle-partition override
(prior value restored in a finally) and removes the staging input and
checkpoint dirs on exit — only the rollup-sized target outlives the
call (r14 advice #2/#3). The staging pass itself reads the corpus
once; the RETURNED frame scans only the target, so the
registration-time scan gate sees 1 parquet scan (declared).

100 TB posture: these queries exist to prove the maintenance algebra,
not to model production staging — at scale the stream source is the
landing bucket/Kafka (streaming/kafka.py) and never a re-write of the
corpus. The maintained tables stay rollup-sized; per-batch cost is
O(batch) + one rollup-sized merge (streaming/rollup.py module doc).
"""

from __future__ import annotations

import contextlib
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.catalog import load_table
from legendary_data_pipeline_spark.queries import register_shadow

#: Staged events carry the engine's normalized integer-nanos ts
#: (catalog.normalize_event_ts), not the on-disk TIMESTAMP — the stream
#: edge re-derives event_time exactly like the batch loaders.
_STAGED_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)

#: Far beyond the fixture's event-time span — see module doc.
_NEVER_LATE = "3650 days"


def _stage_events(spark: SparkSession, sf_dir: str, root: str, copies: int = 1) -> str:
    """Write the normalized events table into `root`/in as 2 parquet
    files per copy (maxFilesPerTrigger=1 then yields ≥2 micro-batches —
    the cross-batch semantics the parity claims, at the minimum batch
    count so the fixed per-batch cost stays off the bench's back).
    `copies=2` appends the same rows twice — exact re-delivery, the
    at-least-once upstream the dedup operator collapses."""
    staging = f"{root}/in"
    ev = load_table(spark, sf_dir, "events")
    for _ in range(copies):
        ev.repartition(2).write.mode("append").parquet(staging)
    return staging


def _read_staged_stream(spark: SparkSession, staging: str) -> DataFrame:
    return (
        spark.readStream.schema(_STAGED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )


@contextlib.contextmanager
def _parity_run(spark: SparkSession, prefix: str):
    """Scoped staging root + tiny-state conf for one parity run.

    State sizing: the session default shuffle-partition count (2x
    cores, ≥32 — ensure_engine_confs) is right for corpus-scale
    shuffles but makes TINY streaming state expensive: each state
    partition writes a delta file per micro-batch, so 64 partitions x N
    batches of checkpoint I/O dominates a rollup whose whole state is a
    few hundred rows. 8 partitions is plenty for the parity tables;
    production streams take the session conf (streaming/*.py entry
    points set nothing).

    The prior value is restored in the finally (r14 advice #2) — a
    direct caller's session conf is unchanged after the callable
    returns, instead of depending on the NEXT registered query's
    ensure_engine_confs. The staging input and checkpoint/state dirs
    are removed on exit too (r14 advice #3 — repeated bench/driver
    runs used to accumulate unbounded /tmp); only the written target
    under the root outlives the call, which is all driver-side
    re-collection of the returned frame needs.
    """
    root = tempfile.mkdtemp(prefix=prefix)
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        yield root
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        for sub in ("in", "ckpt"):
            shutil.rmtree(f"{root}/{sub}", ignore_errors=True)


@register_shadow(
    "stream_rollup_parity",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS events,
           CAST(SUM(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_value_cents
    FROM events
    GROUP BY 1, 2
    """,
    doc="X234 streaming daily-rollup parity: a REAL availableNow run of "
    "daily_event_rollup_stream (windowed streaming aggregation, state "
    "carried across micro-batches, update-mode re-emission) through "
    "the foreachBatch keyed-upsert sink (S5 semantics per batch — the "
    "reference's ON CONFLICT rerun, 01_import_pricecharting_csv.js:"
    "171-186, run continuously). The maintained snapshot must equal "
    "the one-shot batch aggregation: decomposable-aggregate algebra + "
    "at-least-once upsert = full recompute."
    " Returned frame reads only the maintained table (scan_budget=1);"
    " the staging pass is a separate job, scoped+cleaned by _parity_run.",
    scan_budget=1,
)
def stream_rollup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legendary_data_pipeline_spark.streaming.snapshots import (
        daily_event_rollup_stream,
        upsert_sink,
    )

    with _parity_run(spark, "ldp_stream_daily_") as root:
        staging = _stage_events(spark, sf_dir, root)
        target, ckpt = f"{root}/out", f"{root}/ckpt"
        rolled = daily_event_rollup_stream(
            _read_staged_stream(spark, staging),
            watermark=_NEVER_LATE,
            include_approx_users=False,
        )
        q = (
            rolled.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(upsert_sink(target, ["day", "event_type"]))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(target).select(
        "day", "event_type", "events", "total_value_cents"
    )


@register_shadow(
    "stream_dedup_parity",
    """
    SELECT event_type,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users,
           CAST(SUM(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_value_cents
    FROM events
    GROUP BY 1
    """,
    doc="X235 streaming exact-dedup parity: the staged input is the "
    "events table delivered TWICE (4 files, one per micro-batch) — "
    "exact at-least-once redelivery. dropDuplicatesWithinWatermark on "
    "event_id (state spanning micro-batches) must collapse it to "
    "exactly-once: the per-type rollup of the deduped append-mode sink "
    "equals the batch rollup of the single-delivery table. event_id is "
    "unique in the fixture (asserted in test_new_ops_r14.py), so the "
    "surviving copy is value-identical whichever arrival wins."
    " Returned frame reads only the maintained table (scan_budget=1);"
    " the staging pass is a separate job, scoped+cleaned by _parity_run.",
    scan_budget=1,
)
def stream_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legendary_data_pipeline_spark.streaming.snapshots import (
        dedup_events_stream,
    )

    with _parity_run(spark, "ldp_stream_dedup_") as root:
        staging = _stage_events(spark, sf_dir, root, copies=2)
        target, ckpt = f"{root}/out", f"{root}/ckpt"
        deduped = dedup_events_stream(
            _read_staged_stream(spark, staging), watermark=_NEVER_LATE
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", target)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    cents = F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
    return (
        spark.read.parquet(target)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.countDistinct("user_id").alias("unique_users"),
            F.sum(cents).alias("total_value_cents"),
        )
    )


@register_shadow(
    "stream_maint_parity",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS events,
           CAST(SUM(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_value_cents,
           CAST(MAX(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)) AS BIGINT)
             AS max_value_cents
    FROM events
    GROUP BY 1, 2
    """,
    doc="X236 versioned-rollup maintenance parity: "
    "run_rollup_maintenance_once drains one micro-batch per staged file through the "
    "merge_rollup sink — each batch aggregated O(batch) and merged "
    "into the versioned table's next snapshot (stage-then-publish, "
    "batch-id manifests; streaming/rollup.py) — and the LATEST "
    "version must equal the full recompute. This is the 100 TB "
    "maintenance shape: history is never rescanned. The staged input "
    "is pre-projected to (day, event_type, v_cents) so the generic "
    "maintenance entry point runs unmodified."
    " Returned frame reads only the maintained table (scan_budget=1);"
    " the staging pass is a separate job, scoped+cleaned by _parity_run.",
    scan_budget=1,
)
def stream_maint_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from legendary_data_pipeline_spark.sources.versioned import read_version
    from legendary_data_pipeline_spark.streaming.rollup import (
        run_rollup_maintenance_once,
    )

    with _parity_run(spark, "ldp_stream_maint_") as root:
        staging = f"{root}/in"
        ev = load_table(spark, sf_dir, "events")
        day = F.date_format(
            F.expr(
                "date_add(DATE '1970-01-01', CAST(ts DIV 86400000000000 AS INT))"
            ),
            "yyyy-MM-dd",
        )
        cents = F.round(
            F.col("value").cast("decimal(18,2)") * 100, 0
        ).cast("long")
        ev.select(
            day.alias("day"), "event_type", cents.alias("v_cents")
        ).repartition(2).write.parquet(staging)

        table, ckpt = f"{root}/rollup", f"{root}/ckpt"
        run_rollup_maintenance_once(
            spark,
            staging,
            "day string, event_type string, v_cents long",
            table,
            keys=["day", "event_type"],
            specs=[
                ("events", "count", None),
                ("total_value_cents", "sum", F.col("v_cents")),
                ("max_value_cents", "max", F.col("v_cents")),
            ],
            kinds={
                "events": "count",
                "total_value_cents": "sum",
                "max_value_cents": "max",
            },
            checkpoint_path=ckpt,
            max_files_per_trigger=1,
        )
    return read_version(spark, table).select(
        "day", "event_type", "events", "total_value_cents", "max_value_cents"
    )


# ---------------------------------------------------------------------------
# X237 — streaming Count-Min maintenance parity
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 1024
_CMS_TOPN = 20


def _stream_cms_oracle() -> str:
    """Same oracle shape as sk_cms_partkey_freq, over events.user_id —
    the SQL rebuilds the cell table in one shot; the Spark side must
    arrive at the identical cells through per-batch versioned merges."""
    from legendary_data_pipeline_spark.operators.cms import cms_sql_parts

    addrs = cms_sql_parts(
        "CAST(user_id AS VARCHAR)", _CMS_DEPTH, _CMS_WIDTH
    )
    updates = "\n      UNION ALL\n".join(
        f"      SELECT {i} AS row_idx, {a} AS col_idx FROM events"
        for i, a in enumerate(addrs)
    )
    probe_addrs = "\n      UNION ALL\n".join(
        f"      SELECT user_id, exact_cnt, {i} AS row_idx,"
        f" {a} AS col_idx FROM top"
        for i, a in enumerate(addrs)
    )
    return f"""
    WITH u AS (
{updates}),
    cells AS (
      SELECT row_idx, col_idx, CAST(count(*) AS BIGINT) AS cnt
      FROM u GROUP BY 1, 2),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY 1),
    top AS (
      SELECT * FROM exact
      ORDER BY exact_cnt DESC, user_id ASC LIMIT {_CMS_TOPN}),
    addr AS (
{probe_addrs}),
    est AS (
      SELECT user_id, exact_cnt,
             min(COALESCE(cnt, 0)) AS cms_est
      FROM addr LEFT JOIN cells USING (row_idx, col_idx)
      GROUP BY 1, 2)
    SELECT user_id, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount
    FROM est
    """


@register_shadow(
    "stream_cms_parity",
    _stream_cms_oracle(),
    doc="X237 streaming Count-Min maintenance parity: "
    "run_cms_maintenance_once sketches each micro-batch and cell-SUMS "
    "it into the versioned sketch table (streaming/rollup.py "
    "cms_maintenance_sink, batch-id replay guards) — state stays "
    "<= depth x width cells forever while absorbing unbounded stream "
    "history. Parity: the MAINTAINED sketch's top-20 user-frequency "
    "estimates (portable md5 affine hash family, bit-deterministic) "
    "must equal the one-shot sketch the SQL oracle rebuilds — the "
    "cell-wise merge telescopes exactly. Completes the streaming "
    "surface's sketch-maintenance story alongside the rollup "
    "(X236) and exact-aggregate (X234) parities.",
    scan_budget=2,
)
def stream_cms_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legendary_data_pipeline_spark.operators.cms import cms_query
    from legendary_data_pipeline_spark.sources.versioned import read_version
    from legendary_data_pipeline_spark.streaming.rollup import (
        run_cms_maintenance_once,
    )

    with _parity_run(spark, "ldp_stream_cms_") as root:
        staging = _stage_events(spark, sf_dir, root)
        table, ckpt = f"{root}/cms", f"{root}/ckpt"
        run_cms_maintenance_once(
            spark,
            staging,
            _STAGED_SCHEMA,
            table,
            key_col="user_id",
            checkpoint_path=ckpt,
            depth=_CMS_DEPTH,
            width=_CMS_WIDTH,
            max_files_per_trigger=1,
        )
    sketch = read_version(spark, table)
    # probe side: the 20 hottest users by exact count (deterministic
    # count-then-id ordering) — the exact counts ride the output anyway
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    top = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("user_id").asc()
    ).limit(_CMS_TOPN)
    est = cms_query(sketch, top, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    return est.select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )
