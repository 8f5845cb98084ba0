"""Pathological-bucket guard for the banded LSH candidate generators.

Adversarial corpus: every document identical ⇒ every (band, key) bucket
holds ALL documents, and the uncapped self-join is B² per band. The cap
must SAMPLE those buckets down to `max_bucket_size` members (bounding
the join at cap² with a deterministic, layout-independent draw — the
cap-many hash-smallest ids survive) while leaving benign corpora
untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    simhash_band_pairs,
)

N_IDENTICAL = 200
CAP = 50


def _identical_corpus(spark):
    return spark.range(N_IDENTICAL).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the same boilerplate text repeated across every document "
            "in this adversarial corpus for bucket cap testing"
        ).alias("text"),
    )


def test_minhash_lsh_cap_samples_pathological_buckets(spark):
    docs = _identical_corpus(spark)
    sigs = minhash_signatures(docs)
    capped = lsh_candidate_pairs(sigs, max_bucket_size=CAP)
    # Identical docs ⇒ identical signatures ⇒ every band bucket holds the
    # SAME surviving id set (the order key depends only on doc_id), so
    # the distinct pair count is exactly C(cap, 2) — bounded, not zero:
    # recall degrades gracefully instead of cliffing.
    assert capped.count() == CAP * (CAP - 1) // 2
    # Survivors are a subset of the corpus and pair only among themselves.
    ids = {
        r[0]
        for r in capped.select(F.explode(F.array("id_a", "id_b"))).collect()
    }
    assert len(ids) == CAP and ids <= set(range(N_IDENTICAL))
    # Determinism: same data, fresh plan ⇒ identical surviving pair set.
    again = lsh_candidate_pairs(
        minhash_signatures(_identical_corpus(spark)), max_bucket_size=CAP
    )
    assert {(r[0], r[1]) for r in again.collect()} == {
        (r[0], r[1]) for r in capped.collect()
    }
    # Uncapped on a small clone set still works (sanity: the cap is the
    # only thing that bounded them).
    few = lsh_candidate_pairs(
        minhash_signatures(_identical_corpus(spark).limit(5))
    )
    assert few.count() == 5 * 4 // 2


def test_minhash_lsh_cap_keeps_benign_buckets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(docs).cache()
    uncapped = {
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, max_bucket_size=100).collect()
    }
    sigs.unpersist()
    # documents.parquet has no 100-deep band bucket: cap is a no-op.
    assert capped == uncapped


def test_simhash_band_cap_samples_pathological_buckets(spark):
    docs = _identical_corpus(spark)
    fp = simhash(docs)
    capped = simhash_band_pairs(fp, max_bucket_size=CAP)
    assert capped.count() == CAP * (CAP - 1) // 2
    few = simhash_band_pairs(simhash(_identical_corpus(spark).limit(5)))
    assert few.count() == 5 * 4 // 2
