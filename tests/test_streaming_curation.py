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


def test_incremental_dedup_stream_vs_batch_operator(spark, sf_dir, tmp_path):
    """Streaming incremental dedup must agree with the batch operator on
    which documents are corpus-dups, and the sink must admit each new
    content hash exactly once across micro-batches."""
    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.operators.dedup import (
        corpus_hash_index,
        incremental_exact_dedup,
    )
    from legendary_data_pipeline_spark.streaming.curation import (
        run_incremental_dedup_once,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Corpus = sources src0/src1; the stream delivers the full table, so
    # its src0/src1 docs must classify as corpus_dup and be dropped.
    corpus = docs.filter(F.col("source").isin("src0", "src1"))
    idx_path = str(tmp_path / "corpus_idx")
    corpus_hash_index(corpus).write.parquet(idx_path)

    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    import shutil as _sh

    _sh.copyfile(f"{sf_dir}/documents.parquet", docs_dir / "d0.parquet")
    target = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt2")
    run_incremental_dedup_once(spark, str(docs_dir), idx_path, target, ckpt)

    got = spark.read.parquet(target)
    got_ids = {r["doc_id"] for r in got.collect()}
    batch = incremental_exact_dedup(docs, spark.read.parquet(idx_path))
    expected_ids = {
        r["doc_id"]
        for r in batch.filter(F.col("dedup_status") == "unique").collect()
    }
    assert got_ids == expected_ids and got_ids
    # One row per content hash in the target.
    per_sha = got.groupBy("text_sha").count().collect()
    assert all(r["count"] == 1 for r in per_sha)
    # Re-delivering the same file is a no-op (checkpoint + keyed merge).
    run_incremental_dedup_once(spark, str(docs_dir), idx_path, target, ckpt)
    assert spark.read.parquet(target).count() == len(per_sha)
