"""shuffle_shard and repeat_by_weight: permutation/determinism and
mixture-factor contracts beyond what the DuckDB oracle rows pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.curation import (
    repeat_by_weight,
    shuffle_shard,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )


def test_shuffle_shard_is_a_permutation(spark):
    n, shards = 200, 8
    dealt = shuffle_shard(_docs(spark, n), n_shards=shards).collect()
    assert len(dealt) == n
    assert sorted(r["doc_id"] for r in dealt) == list(range(n))
    by_shard: dict[int, list[int]] = {}
    for r in dealt:
        assert 0 <= r["shard"] < shards
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    # positions within each shard are exactly 0..size-1
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_shuffle_shard_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark, 150)

    def layout(seed):
        return sorted(
            (r["doc_id"], r["shard"], r["shard_pos"])
            for r in shuffle_shard(docs, n_shards=4, seed=seed).collect()
        )

    assert layout(7) == layout(7)
    assert layout(7) != layout(8)


def test_shuffle_shard_rejects_bad_shards(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shard(_docs(spark, 10), n_shards=0)


def test_repeat_by_weight_mixture_factors(spark):
    docs = _docs(spark, 200)  # 50 docs per source
    out = repeat_by_weight(
        docs,
        {"src0": 0.0, "src1": 2.5, "src2": 1.0},
        stratum_col="source",
        default_weight=3.0,
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "src0" not in counts  # weight 0 drops the stratum
    assert counts["src2"] == 50  # weight 1 is identity
    assert counts["src3"] == 150  # integer weight = exact multiple
    assert 2 * 50 <= counts["src1"] <= 3 * 50  # 2.5: between 2n and 3n


def test_repeat_by_weight_epoch_contract(spark):
    docs = _docs(spark, 80)
    out = repeat_by_weight(docs, {"src1": 2.3}, stratum_col="source")
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.count("*").alias("copies"),
            F.sort_array(F.collect_list("epoch")).alias("epochs"),
        )
        .collect()
    )
    for r in per_doc:
        assert r["epochs"] == list(range(r["copies"]))


def test_repeat_by_weight_fraction_gate_matches_rate_sample(spark):
    """Weight 0.4 keeps the SAME ids stratified_hash_sample keeps at
    rate 0.4 (one consistent notion of a stratum's 'first 40%')."""
    from legendary_data_pipeline_spark.operators.curation import (
        stratified_hash_sample,
    )

    docs = _docs(spark, 200)
    seed = 11
    kept = {
        r["doc_id"]
        for r in repeat_by_weight(
            docs, {"src1": 0.4}, stratum_col="source", seed=seed,
            default_weight=0.0,
        ).collect()
    }
    gated = stratified_hash_sample(
        docs, {"src1": 0.4}, stratum_col="source", seed=seed, default_rate=0.0
    )
    expected = {
        r["doc_id"] for r in gated.filter("keep AND source = 'src1'").collect()
    }
    assert kept == expected


def test_repeat_by_weight_rejects_negative(spark):
    with pytest.raises(ValueError, match="negative weight"):
        repeat_by_weight(_docs(spark, 10), {"src0": -0.5})
