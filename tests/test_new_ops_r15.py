"""Round-15 contracts.

1. NULL-text gate parity (r14 advice #1): the disagreement oracle's pii
   signal `pk.p` was the only gate clause not COALESCEd to FALSE, so a
   NULL-text document would group into a NULL pii_keep cell on the
   oracle side while the Spark side coalesces to False. Pin parity on a
   fixture that actually contains a NULL-text doc.
2. Streaming-parity session hygiene (r14 advice #2/#3, verdict #2):
   each parity callable must restore spark.sql.shuffle.partitions on
   exit and clean up its staging/checkpoint tmpdirs (only the written
   target outlives the call, for driver re-collection); all parity
   queries declare a scan_budget.
"""

from __future__ import annotations

import glob
import os

from tests.conftest import SF_DIR
from tests.oracle_utils import compare_to_oracle


def _null_text_sf_dir(spark, tmp_path) -> str:
    """A tmp sf dir = real sf0.001 tables (symlinked) with documents
    replaced by a copy carrying one NULL-text row."""
    from legendary_data_pipeline_spark.catalog import TABLES

    root = tmp_path / "sf_nulltext"
    root.mkdir()
    for t in TABLES:
        if t == "documents":
            continue
        os.symlink(f"{SF_DIR}/{t}.parquet", str(root / f"{t}.parquet"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    extra = spark.createDataFrame(
        [(999_999, None, "en", "synthetic", None)], docs.schema
    )
    staged = str(tmp_path / "docs_staged")
    docs.unionByName(extra).coalesce(1).write.parquet(staged)
    (part,) = glob.glob(f"{staged}/*.parquet")
    os.symlink(part, str(root / "documents.parquet"))
    return str(root)


def test_gate_disagreement_null_text_oracle_parity(spark, tmp_path):
    from legendary_data_pipeline_spark.queries import SHADOW_REGISTRY, REGISTRY

    spec = (REGISTRY | SHADOW_REGISTRY)["curation_gate_disagreement"]
    sf = _null_text_sf_dir(spark, tmp_path)
    compare_to_oracle(spec.spark_fn(spark, sf), spec.oracle, sf)


def test_gate_funnel_null_text_oracle_parity(spark, tmp_path):
    # the funnel shares _GATE_SIGNALS_CTES — pin it on the same fixture
    from legendary_data_pipeline_spark.queries import SHADOW_REGISTRY, REGISTRY

    spec = (REGISTRY | SHADOW_REGISTRY)["curation_gate_funnel"]
    sf = _null_text_sf_dir(spark, tmp_path)
    compare_to_oracle(spec.spark_fn(spark, sf), spec.oracle, sf)


_PARITY_QUERIES = (
    "stream_rollup_parity",
    "stream_dedup_parity",
    "stream_maint_parity",
    "stream_cms_parity",
)


def test_parity_queries_restore_shuffle_partitions_and_clean_tmp(spark):
    """r14 verdict #2: a DIRECT invocation of any streaming parity
    query must leave the session's shuffle-partition conf unchanged
    (no dependence on the next query's ensure_engine_confs), and must
    not leave its staging input / checkpoint dirs behind in /tmp."""
    from legendary_data_pipeline_spark.queries import REGISTRY, SHADOW_REGISTRY
    from legendary_data_pipeline_spark.session import ensure_engine_confs

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # every registered callable runs ensure_engine_confs on entry,
        # so the restorable value IS the engine value — the contract is
        # that the query exits with that value, never the tiny-state 8.
        ensure_engine_confs(spark)
        engine_val = spark.conf.get("spark.sql.shuffle.partitions")
        assert engine_val != "8"
        for name in _PARITY_QUERIES:
            spec = (REGISTRY | SHADOW_REGISTRY)[name]
            before = set(glob.glob("/tmp/ldp_stream_*"))
            df = spec.spark_fn(spark, SF_DIR)
            assert (
                spark.conf.get("spark.sql.shuffle.partitions") == engine_val
            ), name
            assert df.count() >= 0  # returned frame survives cleanup
            new_roots = set(glob.glob("/tmp/ldp_stream_*")) - before
            assert new_roots, name  # staged at least one fresh root
            for r in new_roots:
                assert not os.path.exists(f"{r}/in"), name
                assert not os.path.exists(f"{r}/ckpt"), name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)


def test_parity_queries_declare_scan_budget():
    """r14 verdict #2: the scan-audit disposition must be
    machine-readable on all four parity queries."""
    from legendary_data_pipeline_spark.queries import REGISTRY, SHADOW_REGISTRY

    for name in _PARITY_QUERIES:
        spec = (REGISTRY | SHADOW_REGISTRY)[name]
        assert spec.scan_budget is not None, name
