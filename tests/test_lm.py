"""Perplexity-filter contracts: in-domain text must score far lower
than scrambled or out-of-vocabulary text, scoring is deterministic, and
the gate keeps/drops accordingly.
"""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.lm import (
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)

TRUSTED = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "a quick fox and a lazy dog play in the field",
    "the brown dog and the brown fox rest in the field",
] * 5


def test_in_domain_scores_below_scrambled_and_oov(spark):
    model = train_bigram_lm(TRUSTED)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # in-domain
            (2, "dog the lazy fox brown quick the jumps over"),  # scrambled
            (3, "zzq qqz xxv vvx qzx zxq vqx xqv qvz zqv"),       # OOV garble
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in score_perplexity(docs, model).collect()}
    assert out[1]["ppl"] < out[2]["ppl"] < out[3]["ppl"]
    # Fluent in-domain text is an order of magnitude better than garble.
    assert out[3]["ppl"] / out[1]["ppl"] > 10
    # Determinism.
    again = {r["doc_id"]: r["ppl"] for r in score_perplexity(docs, model).collect()}
    assert again == {k: v["ppl"] for k, v in out.items()}


def test_gate_keeps_fluent_drops_garble(spark):
    trusted = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRUSTED)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (100, "the quick fox jumps over the lazy dog"),
            (101, "zzq qqz xxv vvx qzx zxq vqx xqv"),
            (102, ""),  # empty → NULL ppl, kept (length filters decide)
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in perplexity_filter(docs, trusted, max_ppl=50.0).collect()
    }
    assert out[100]["keep"] is True
    assert out[101]["keep"] is False
    assert out[102]["keep"] is True and out[102]["ppl"] is None


def test_corpus_scoring_separates_real_from_corrupted(spark, sf_dir):
    """On the fixture corpus: train on src0, score src1 docs vs the
    same docs with every 3rd token replaced by out-of-vocabulary
    garble — corruption must raise perplexity on every document.
    (The fixture's text is a random word bag, so an ORDER-based probe
    like token reversal is undetectable by construction — OOV noise is
    the signal this corpus can carry.)"""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    trusted = docs.filter(F.col("source") == "src0")
    probe = docs.filter(F.col("source") == "src1").limit(50)
    toks = F.split(F.trim("text"), r"\s+")
    corrupted = probe.select(
        "doc_id",
        F.array_join(
            F.transform(
                toks,
                lambda t, i: F.when(i % 3 == 0, F.lit("zzqx")).otherwise(t),
            ),
            " ",
        ).alias("text"),
    )
    real = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_filter(probe, trusted, max_ppl=1e9).collect()
    }
    bad = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_filter(corrupted, trusted, max_ppl=1e9).collect()
    }
    assert all(bad[k] > real[k] for k in real)
    mean_ratio = sum(bad[k] / real[k] for k in real) / len(real)
    assert mean_ratio > 2.0, mean_ratio
