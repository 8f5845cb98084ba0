"""Round-15 OPTIMIZATION pins.

The optimization round changed operator internals without changing any
query's results; these tests pin the internals' contracts:

1. `_stage_ordered_files` single-pass rewrite: batch file i still holds
   exactly parts[i]'s rows (one file per part, mtime-ordered).
2. `_stage_events` filesystem-copy redelivery: the redelivered files
   are byte-identical copies and double the staged row count.
3. `ensure_engine_confs` pins the broadcast threshold, so an
   externally-created (driver) session plans joins like the engine's
   own sessions (plan-shape determinism across sessions).
"""

from __future__ import annotations

import filecmp
import glob

from tests.conftest import SF_DIR


def test_stage_ordered_files_single_pass_content_mapping(spark, tmp_path):
    from legendary_data_pipeline_spark import queries as _q  # noqa: F401 — registry first (partial-import guard)
    from legendary_data_pipeline_spark.queries_streaming import (
        _stage_ordered_files,
    )

    df = spark.range(100).selectExpr("id AS v")
    parts = [df.filter("v < 30"), df.filter("v >= 30 AND v < 31"), df.filter("v >= 31")]
    staging = _stage_ordered_files(spark, parts, str(tmp_path))
    files = sorted(glob.glob(f"{staging}/batch-*.parquet"))
    assert [f.rsplit("/", 1)[1] for f in files] == [
        "batch-000.parquet", "batch-001.parquet", "batch-002.parquet",
    ]
    import os

    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
    got = [
        sorted(r.v for r in spark.read.parquet(f).collect()) for f in files
    ]
    assert got[0] == list(range(30))
    assert got[1] == [30]
    assert got[2] == list(range(31, 100))


def test_stage_events_fs_copy_redelivery(spark, tmp_path):
    from legendary_data_pipeline_spark import queries as _q  # noqa: F401 — registry first (partial-import guard)
    from legendary_data_pipeline_spark.catalog import load_table
    from legendary_data_pipeline_spark.queries_streaming import _stage_events

    staging = _stage_events(spark, SF_DIR, str(tmp_path), copies=2)
    originals = sorted(glob.glob(f"{staging}/part-*.parquet"))
    copies = sorted(glob.glob(f"{staging}/redelivery-*.parquet"))
    assert len(originals) == 2 and len(copies) == 2
    for src, dst in zip(originals, copies):
        assert filecmp.cmp(src, dst, shallow=False)  # byte-identical
    n_events = load_table(spark, SF_DIR, "events").count()
    assert spark.read.parquet(staging).count() == 2 * n_events


def test_ensure_engine_confs_pins_broadcast_threshold(spark):
    from legendary_data_pipeline_spark.session import ensure_engine_confs

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )
        ensure_engine_confs(spark)
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(
            64 * 1024 * 1024
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
