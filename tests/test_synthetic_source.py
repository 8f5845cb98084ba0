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
