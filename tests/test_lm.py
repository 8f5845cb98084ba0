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


# ---------------------------------------------------------------------------
# unigram_surprisal_gate (round 7 — the oracle-able LM-gate twin)
# ---------------------------------------------------------------------------


def test_surprisal_in_domain_scores_lower_than_oov(spark):
    from legendary_data_pipeline_spark.operators.lm import (
        unigram_surprisal_gate,
    )

    trusted = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (100, "the quick brown fox"),          # pure in-domain
            (101, "zzz qqq xxx www"),               # pure OOV
            (102, "the quick zzz qqq"),             # mixed
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in unigram_surprisal_gate(
            docs, trusted, max_mean_micro=10**9
        ).collect()
    }
    s100 = out[100]["mean_surprisal_micro"]
    s101 = out[101]["mean_surprisal_micro"]
    s102 = out[102]["mean_surprisal_micro"]
    assert s100 < s102 < s101
    assert all(out[d]["kept"] for d in (100, 101, 102))  # huge threshold


def test_surprisal_empty_doc_and_gate_edge(spark):
    from legendary_data_pipeline_spark.operators.lm import (
        unigram_surprisal_gate,
    )

    trusted = spark.createDataFrame(
        [(1, "a b c a b a")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(10, "a a a"), (11, ""), (12, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in unigram_surprisal_gate(
            docs, trusted, max_mean_micro=0
        ).collect()
    }
    # every doc row survives, even token-less ones
    assert set(rows) == {10, 11, 12}
    for d in (11, 12):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["mean_surprisal_micro"] is None
        assert rows[d]["kept"] is False
    # hand-check doc 10: T=6, V=3, c('a')=3 → w = -floor(ln(4/9)*1e6)
    import math

    w_a = -math.floor(math.log(4 / 9) * 1_000_000)
    assert rows[10]["n_tokens"] == 3
    assert rows[10]["mean_surprisal_micro"] == w_a  # mean of 3 equal weights
    assert rows[10]["kept"] is False  # threshold 0


def test_surprisal_deterministic_across_partitionings(spark):
    from legendary_data_pipeline_spark.operators.lm import (
        unigram_surprisal_gate,
    )

    trusted = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common") for i in range(50)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(i, f"common tok{i % 5} novel{i}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, unigram_surprisal_gate(docs, trusted, 10**9).collect())
    )
    b = sorted(
        map(
            tuple,
            unigram_surprisal_gate(
                docs.repartition(13), trusted.repartition(7), 10**9
            ).collect(),
        )
    )
    assert a == b
