"""Contracts for the custom Python DataSource (synthetic corpus
generator): determinism, partition-invariance, parallel planning, and
schema compatibility with the engine's text operators.
"""

from __future__ import annotations

import pytest

from legendary_data_pipeline_spark.sources.synthetic import (
    register_synthetic_source,
)


@pytest.fixture()
def registered(spark):
    register_synthetic_source(spark)
    return spark


def _load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rowcount_schema_and_parallelism(registered):
    df = _load(registered, numRows=1000, numPartitions=8, seed=7)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 8
    assert df.select("doc_id").distinct().count() == 1000


def test_bit_deterministic_and_partition_invariant(registered):
    a = _load(registered, numRows=500, numPartitions=4, seed=3).collect()
    b = _load(registered, numRows=500, numPartitions=4, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # More partitions → same rows (only task boundaries move).
    c = _load(registered, numRows=500, numPartitions=11, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, c))
    # Different seed → different corpus.
    d = _load(registered, numRows=500, numPartitions=4, seed=4).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, d))


def test_natural_distribution_options(registered):
    """vocabSize gives an open Zipf-ish vocabulary; dupPpm plants
    near-duplicates at a controlled rate — the knobs behind the
    natural-distribution scale fixture (round 7). Defaults unchanged."""
    from pyspark.sql import functions as F

    df = _load(
        registered, numRows=4000, numPartitions=8, seed=11,
        vocabSize=1500, dupPpm=20000,
    )
    rows = df.collect()
    assert len(rows) == 4000
    # determinism with the new options
    again = _load(
        registered, numRows=4000, numPartitions=3, seed=11,
        vocabSize=1500, dupPpm=20000,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # open vocabulary actually used, with a skewed (Zipf-ish) head
    words = (
        df.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w").count().collect()
    )
    assert len(words) > 300  # far beyond the legacy 20-word list
    counts = sorted((r["count"] for r in words), reverse=True)
    assert counts[0] > 10 * counts[len(counts) // 2]  # heavy head
    # planted near-dups: ~2% of rows share >=80% of their words with an
    # earlier row; count pairs via exact-text prefix match proxy — use
    # the dup construction directly instead: regenerate and compare.
    from legendary_data_pipeline_spark.sources.synthetic import _base_words, _mix

    planted = 0
    for i in range(1, 4000):
        h = _mix((11 << 32) ^ i)
        d = _mix(h ^ 0xD0D0)
        if (d % 1_000_000) < 20000:
            planted += 1
    assert 40 <= planted <= 120  # ~2% of 4000, binomial slack
    # and a planted row differs from its source in exactly one position
    texts = {r["doc_id"]: r["text"] for r in rows}
    checked = 0
    for i in range(1, 4000):
        h = _mix((11 << 32) ^ i)
        d = _mix(h ^ 0xD0D0)
        if (d % 1_000_000) < 20000:
            j = i - 1 - (_mix(d) % min(i, 1000))
            base = _base_words(11, j, 1500)
            got = texts[i].split(" ")
            assert len(got) == len(base)
            diffs = sum(1 for a, b in zip(got, base) if a != b)
            assert diffs <= 1
            checked += 1
    assert checked == planted


def test_generated_corpus_feeds_text_operators(registered):
    from legendary_data_pipeline_spark.operators.textstats import (
        token_stats,
    )

    df = _load(registered, numRows=300, numPartitions=4, seed=1)
    stats = token_stats(df)
    assert stats.count() == 300
    assert stats.filter("token_count >= 5").count() == 300


def test_more_partitions_than_rows_is_safe(registered):
    df = _load(registered, numRows=3, numPartitions=16, seed=0)
    assert df.count() == 3
    assert df.rdd.getNumPartitions() <= 3


def test_zero_rows_is_an_empty_read(registered):
    df = _load(registered, numRows=0, numPartitions=8, seed=0)
    assert df.count() == 0
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_moderate_scale_pipeline_over_generated_corpus(registered):
    """200k generated docs through exact dedup, Bloom probe, and NB
    scoring — the operators' shapes hold beyond fixture scale and the
    generator's throughput is partition-parallel, not driver-bound."""
    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.operators.bloom import (
        build_bloom,
        probe_bloom,
    )
    from legendary_data_pipeline_spark.operators.classifier import (
        score_nb,
        train_nb,
    )

    docs = _load(registered, numRows=200_000, numPartitions=32, seed=11)

    # Exact dedup by content hash: the 20-word vocabulary guarantees
    # heavy collisions at this scale — the dedup path does real work.
    uniq = (
        docs.withColumn("sha", F.sha2("text", 256))
        .groupBy("sha")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
    )
    n_unique = uniq.count()
    assert 0 < n_unique < 200_000

    # Bloom: members of the first 50k must all be flagged when probed.
    corpus = docs.filter("doc_id < 50000")
    bm = build_bloom(corpus, "text", m_bits=1 << 21, k_hashes=4)
    flagged = probe_bloom(corpus.limit(2_000), "text", bm)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0

    # NB: train on two language slices, score the rest — runs end to
    # end and scores every doc exactly once.
    pos = docs.filter("lang = 'en'").limit(5_000)
    neg = docs.filter("lang = 'de'").limit(5_000)
    weights, prior = train_nb(pos, neg, m=1024)
    rest = docs.filter("lang NOT IN ('en', 'de')").limit(20_000)
    scored = score_nb(rest, weights, prior, m=1024)
    assert scored.count() == rest.count()
