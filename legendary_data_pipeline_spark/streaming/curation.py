"""Streaming corpus curation: continuous ingest → scrub → score → dedup.

The batch curation surface (operators/curation.py, textstats) is pure
column expressions, so the SAME transformation function runs on a batch
DataFrame and a file-stream DataFrame — batch/stream parity by
construction, verified in tests/test_streaming_curation.py.

Dedup across micro-batches reuses the engine's keyed upsert sink
(streaming/snapshots.upsert_sink): each batch MERGEs into the curated
table keyed by content hash, so re-delivered or duplicate documents
overwrite their prior row instead of duplicating — the reference's
ON CONFLICT rerun semantics (SURVEY §2.1 S5), applied continuously.
At scale this is the standard "curated table with exactly-one-row-per-
content-hash" shape. Within a micro-batch the surviving row per content
hash is the MIN doc_id (`order_within_source` below) — non-content
columns (doc_id, lang, source) can differ across duplicates of the same
text, so the tiebreak keeps reruns byte-identical; across batches the
winner is last-write, as in the reference's ON CONFLICT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.curation import pii_counts, scrub_pii
from legendary_data_pipeline_spark.operators.textstats import quality_score
from legendary_data_pipeline_spark.streaming.snapshots import upsert_sink

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def curate_documents(docs: DataFrame) -> DataFrame:
    """Stateless curation stage: content hash, quality score, PII scrub.

    Works identically on batch and streaming frames (no aggregation, no
    window — one projection, fully pushdown/codegen friendly).
    """
    scored = quality_score(docs, keep_cols=("text", "lang", "source"))
    counts = pii_counts(F.col("text"))
    return scored.select(
        "doc_id",
        "lang",
        "source",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        "token_count",
        "quality_score",
        "quality_bucket",
        counts["emails"].alias("pii_emails"),
        counts["phones"].alias("pii_phones"),
        counts["ipv4s"].alias("pii_ipv4s"),
        scrub_pii(F.col("text")).alias("clean_text"),
    )


def read_documents_stream(spark: SparkSession, docs_path: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_path)
    )


def run_curation_once(
    spark: SparkSession,
    docs_path: str,
    target_path: str,
    checkpoint_path: str,
) -> None:
    """Drain all available document files once (Trigger.AvailableNow),
    curate, and MERGE into the target keyed by content hash."""
    stream = read_documents_stream(spark, docs_path)
    curated = curate_documents(stream)
    query = (
        curated.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            upsert_sink(
                target_path,
                ["text_sha"],
                order_within_source=[F.col("doc_id").asc()],
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
