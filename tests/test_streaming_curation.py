"""Streaming curation: batch/stream parity and continuous-dedup MERGE.

The curation stage is one stateless projection, so streaming output must
equal the batch run of the SAME function on the same files — modulo
which doc_id wins per content hash (last-write in the keyed upsert sink),
so parity is compared on content-derived columns keyed by text_sha.
"""

from __future__ import annotations

import shutil

from legendary_data_pipeline_spark.streaming.curation import (
    curate_documents,
    run_curation_once,
)

_CONTENT_COLS = (
    "lang",
    "source",
    "token_count",
    "quality_score",
    "quality_bucket",
    "pii_emails",
    "pii_phones",
    "pii_ipv4s",
    "clean_text",
)


def _by_sha(df):
    return {
        r["text_sha"]: tuple(r[c] for c in _CONTENT_COLS)
        for r in df.collect()
    }


def test_stream_matches_batch_and_merges_duplicates(spark, sf_dir, tmp_path):
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    shutil.copyfile(
        f"{sf_dir}/documents.parquet", docs_dir / "docs-000.parquet"
    )
    target = str(tmp_path / "curated")
    checkpoint = str(tmp_path / "ckpt")

    run_curation_once(spark, str(docs_dir), target, checkpoint)
    got = _by_sha(spark.read.parquet(target))

    batch = curate_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    expected = _by_sha(batch.dropDuplicates(["text_sha"]))

    assert got == expected
    # keyed by content hash: exactly one row per sha
    n = spark.read.parquet(target).count()
    assert n == len(expected)

    # Re-delivering the same file is a no-op drain (checkpoint) …
    run_curation_once(spark, str(docs_dir), target, checkpoint)
    assert _by_sha(spark.read.parquet(target)) == expected

    # … and delivering a duplicate-content file MERGEs, not duplicates:
    shutil.copyfile(
        f"{sf_dir}/documents.parquet", docs_dir / "docs-001.parquet"
    )
    run_curation_once(spark, str(docs_dir), target, checkpoint)
    after = _by_sha(spark.read.parquet(target))
    assert after == expected
    assert spark.read.parquet(target).count() == len(expected)
