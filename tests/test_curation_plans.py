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
