"""Plan-shape and property evidence for the curation operators.

The decontamination probe must stay a broadcast LEFT SEMI (the training
corpus never shuffles); the sampling gate must be a pure projection
(no added exchange); packing must respect its budget arithmetic; a
higher sampling rate must select a superset (nested samples — the
property that makes hash-gated mixes tunable without churn).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.curation import (
    contamination_flags,
    pack_sequences,
    stratified_hash_sample,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_decontaminate_plan_broadcast_semi_and_pushdown(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    plan = (
        contamination_flags(train, bench, shingle_n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # The source filters reach the parquet scan:
    assert "PushedFilters: [IsNotNull(source), Not(EqualTo(source,src0))]" in plan
    # No sort-merge join anywhere — nothing corpus-sized shuffles on text:
    assert "SortMergeJoin" not in plan


def test_stratified_sample_adds_no_exchange(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    gated = stratified_hash_sample(docs, {"en": 0.5}, default_rate=0.1)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection over the scan


def test_stratified_sample_rates_are_nested(spark, sf_dir):
    docs = _docs(spark, sf_dir)

    def kept(rate):
        out = stratified_hash_sample(
            docs, {"en": rate}, default_rate=rate
        ).filter(F.col("keep"))
        return {r["doc_id"] for r in out.select("doc_id").collect()}

    low, high = kept(0.2), kept(0.6)
    assert low <= high
    assert len(low) < len(high)


def test_pack_sequences_budget_arithmetic(spark, sf_dir):
    budget = 128
    packed = pack_sequences(_docs(spark, sf_dir), budget_tokens=budget)
    rows = sorted(
        (r["lang"], r["doc_id"], r["n_tokens"], r["pack_id"])
        for r in packed.collect()
    )
    cum = {}
    for lang, _doc, n, pack in rows:
        start = cum.get(lang, 0)
        assert pack == start // budget, (lang, _doc, start, pack)
        cum[lang] = start + n
    # packs are contiguous & non-decreasing per shard by construction
    seen = {}
    for lang, _doc, _n, pack in rows:
        assert pack >= seen.get(lang, 0)
        seen[lang] = pack


def test_composite_shard_partitions_window_by_bucket(spark, sf_dir):
    from legendary_data_pipeline_spark.operators.curation import (
        chunk_sequences,
    )

    docs = _docs(spark, sf_dir)
    packed = pack_sequences(docs, budget_tokens=256, n_shard_buckets=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    # The cumsum window must partition by (lang, shard_bucket), never by
    # lang alone — no shard-sized single window partition at scale.
    spec_at = plan.find("windowspecdefinition(lang")
    assert spec_at != -1
    spec = plan[spec_at : plan.index(")", spec_at)]
    assert "shard_bucket" in spec
    # Every lang splits into >1 bucket on real data (the point of the knob).
    spread = (
        packed.groupBy("lang")
        .agg(F.countDistinct("shard_bucket").alias("n_buckets"))
        .collect()
    )
    assert spread and all(r["n_buckets"] > 1 for r in spread)
    # Composite packing conserves tokens and doc counts vs plain packing.
    plain = pack_sequences(docs, budget_tokens=256)
    assert (
        packed.agg(F.sum("n_tokens")).first()[0]
        == plain.agg(F.sum("n_tokens")).first()[0]
    )
    assert packed.count() == plain.count()

    # chunk_sequences honors the same composite knob.
    chunks = chunk_sequences(docs, budget_tokens=256, n_shard_buckets=8)
    assert "shard_bucket" in chunks.columns


def test_chunk_sequences_invariants(spark, sf_dir):
    from legendary_data_pipeline_spark.operators.curation import (
        chunk_sequences,
    )

    budget = 256
    docs = _docs(spark, sf_dir)
    chunks = chunk_sequences(docs, budget_tokens=budget).cache()
    # Conservation: each doc's chunk tokens sum to its token count.
    bad = (
        chunks.groupBy("lang", "doc_id", "n_tokens")
        .agg(F.sum("chunk_tokens").alias("s"))
        .filter(F.col("s") != F.col("n_tokens"))
        .count()
    )
    assert bad == 0
    # Fullness: every pack holds exactly `budget` tokens except the last
    # pack of each shard.
    per_pack = chunks.groupBy("lang", "pack_id").agg(
        F.sum("chunk_tokens").alias("tok")
    )
    last = per_pack.groupBy("lang").agg(F.max("pack_id").alias("last_pack"))
    partial = (
        per_pack.join(last, "lang")
        .filter(
            (F.col("pack_id") != F.col("last_pack"))
            & (F.col("tok") != budget)
        )
        .count()
    )
    assert partial == 0
    # Chunk indices are dense from 0 per doc.
    idx = chunks.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("lo"),
        F.max("chunk_idx").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    assert idx.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0
    chunks.unpersist()


def test_weighted_sample_plan_rides_window_group_limit(spark, sf_dir):
    from legendary_data_pipeline_spark.operators.curation import (
        weighted_sample_n,
    )

    docs = _docs(spark, sf_dir)
    out = weighted_sample_n(
        docs, 20, weight_col="n_chars", stratum_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Per-stratum top-N must be a bounded WindowGroupLimit, never a full
    # per-partition sort materialization of the corpus.
    assert "WindowGroupLimit" in plan
    # One shuffle only: the stratum-key exchange feeding the window.
    assert plan.count("Exchange hashpartitioning") == 1


def test_contamination_score_plan_broadcasts_benchmark(spark, sf_dir):
    from legendary_data_pipeline_spark.operators.curation import (
        contamination_scores,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    plan = (
        contamination_scores(train, bench, shingle_n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The probe joins the corpus against BROADCAST benchmark shingles —
    # the corpus-sized side must never sort-merge on shingle text.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_boilerplate_spans_shuffle_only_on_hash_and_id(spark, sf_dir):
    from legendary_data_pipeline_spark.operators.curation import (
        boilerplate_span_stats,
    )

    docs = _docs(spark, sf_dir)
    out = boilerplate_span_stats(docs, span_tokens=12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Exchanges may only key on the span hash or the doc id — span TEXT
    # must never be a shuffle key (hash-first principle).
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+),", plan):
        key = m.group(1)
        assert "span_hash" in key or "doc_id" in key, f"bad shuffle key: {key}"
