"""Guards and type-genericity of the blocked n-gram Jaccard kernel and
the incremental LSH probe (round-4 ADVICE items 1-4).

- id_col may be a string (the applyInPandas output schema derives its
  type from the input, and the kernel's canonical-order swap works on
  object arrays).
- NULL block_col rows are dropped before grouping — parity with the
  join-based blocking this kernel replaced (NULL = NULL is false).
- A block whose one-hot exceeds max_onehot_cells falls back to the
  chunked matmul with IDENTICAL results.
- A block with more docs than max_block_docs auto-falls back to the
  streaming chunk-filtered kernel (no n×n matrix) with IDENTICAL
  results instead of raising or OOMing the executor.
- lsh_probe_pairs bounds pathological corpus band buckets with the same
  deterministic cap as the batch path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.dedup import (
    banded_keys,
    lsh_probe_pairs,
    minhash_signatures,
    ngram_jaccard_blocked,
)

TEXTS = [
    ("a1", "en", "the quick brown fox jumps over the lazy dog today"),
    ("a2", "en", "the quick brown fox jumps over the lazy dog tonight"),
    ("b1", "en", "completely different content about spark aggregation"),
    ("c1", "fr", "le renard brun rapide saute par dessus le chien"),
    ("c2", "fr", "le renard brun rapide saute par dessus le chat"),
    ("n1", None, "the quick brown fox jumps over the lazy dog today"),
    ("n2", None, "the quick brown fox jumps over the lazy dog today"),
]


def _docs(spark, string_ids: bool):
    rows = [
        ((t[0] if string_ids else i), t[1], t[2], len(t[2]))
        for i, t in enumerate(TEXTS)
    ]
    id_type = "string" if string_ids else "long"
    return spark.createDataFrame(
        rows, f"doc_id {id_type}, lang string, text string, n_chars int"
    )


def _pairs(df, **kw):
    out = ngram_jaccard_blocked(df, shingle_n=2, min_jaccard=0.05, **kw)
    return {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in out.collect()}


def test_string_ids_supported(spark):
    got = _pairs(_docs(spark, string_ids=True))
    assert ("a1", "a2") in {(a, b) for a, b, _ in got}
    assert all(isinstance(a, str) and isinstance(b, str) for a, b, _ in got)
    # Canonical order holds for strings too.
    assert all(a < b for a, b, _ in got)


def test_null_block_rows_never_pair(spark):
    got = _pairs(_docs(spark, string_ids=True))
    ids_in_pairs = {x for a, b, _ in got for x in (a, b)}
    # n1/n2 are identical texts but lang IS NULL — excluded, as the old
    # join-based blocking excluded them.
    assert not ids_in_pairs & {"n1", "n2"}
    assert {"a1", "a2"} <= ids_in_pairs


def test_chunked_fallback_matches_dense_path(spark):
    df = _docs(spark, string_ids=False)
    dense = _pairs(df)
    # max_onehot_cells=1 forces every block through the chunked matmul.
    chunked = _pairs(df, max_onehot_cells=1)
    assert dense == chunked and dense


def test_oversized_block_streams_with_identical_pairs(spark):
    """A pathological single-block fixture (every doc over max_block_docs)
    completes through the streaming chunk-filtered kernel and returns
    exactly the dense path's pairs — the manual retune loop is gone."""
    df = _docs(spark, string_ids=False)
    dense = _pairs(df)
    streamed = _pairs(df, max_block_docs=1)
    assert streamed == dense and dense
    # Combined stress: over-cap docs AND over-cap one-hot (chunk = 1).
    both = _pairs(df, max_block_docs=1, max_onehot_cells=1)
    assert both == dense


def test_probe_pairs_cap_bounds_pathological_corpus_bucket(spark):
    text = F.lit("identical boilerplate text shared by the whole corpus")
    corpus = spark.range(200).select(F.col("id").alias("doc_id"), text.alias("text"))
    batch = spark.range(1000, 1005).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    corpus_idx = banded_keys(minhash_signatures(corpus))
    new_banded = banded_keys(minhash_signatures(batch))
    capped = lsh_probe_pairs(new_banded, corpus_idx, max_bucket_size=50)
    # Every batch doc probes at most cap corpus members (identical docs ⇒
    # all bands agree on the same surviving set).
    per_new = capped.groupBy("id_new").count().collect()
    assert len(per_new) == 5 and all(r["count"] == 50 for r in per_new)
    # Deterministic: re-running yields the identical pair set.
    again = lsh_probe_pairs(new_banded, corpus_idx, max_bucket_size=50)
    assert {(r[0], r[1]) for r in again.collect()} == {
        (r[0], r[1]) for r in capped.collect()
    }
    # Uncapped probe on the same data would be 200 per new doc (sanity
    # that the cap did the bounding).
    assert lsh_probe_pairs(new_banded, corpus_idx).count() == 5 * 200


def test_jaccard_pairs_convenience_cache_guard(spark):
    """Round-8 guard: the no-hsets convenience path caches a corpus-
    sized frame, so above max_cache_rows it must raise with the staged
    alternative named; below, and for staged callers, it still works."""
    import pytest as _pytest

    from legendary_data_pipeline_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox leaps")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    # small input: convenience path fine
    out = D.jaccard_pairs(docs, pairs).collect()
    assert len(out) == 1 and 0.0 < out[0]["jaccard"] < 1.0
    # over threshold: raises, names the fix
    with _pytest.raises(ValueError, match="hsets=.*allow_large_cache"):
        D.jaccard_pairs(docs, pairs, max_cache_rows=1)
    # explicit opt-in still allowed
    assert len(D.jaccard_pairs(docs, pairs, max_cache_rows=1,
                               allow_large_cache=True).collect()) == 1
    # staged path untouched by the guard
    hsets = D.hashed_shingle_sets(docs, "doc_id", "text", 3)
    assert len(D.jaccard_pairs(docs, pairs, max_cache_rows=1,
                               hsets=hsets).collect()) == 1
