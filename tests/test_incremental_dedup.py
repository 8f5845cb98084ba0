"""Incremental dedup: exact-status classification against a corpus hash
index, and the LSH probe's equivalence to full candidate generation."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators import dedup as D


def test_incremental_exact_statuses(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha"),   # already in corpus
            (11, "delta"),   # new, first of its text in the batch
            (12, "delta"),   # batch-internal dup of 11
            (13, "epsilon"), # new, unique
            (14, "beta"),    # corpus dup, even though batch-unique
        ],
        "doc_id long, text string",
    )
    index = D.corpus_hash_index(corpus)
    out = D.incremental_exact_dedup(batch, index)
    statuses = {r["doc_id"]: r["dedup_status"] for r in out.collect()}
    assert statuses == {
        10: "corpus_dup",
        11: "unique",
        12: "batch_dup",
        13: "unique",
        14: "corpus_dup",
    }
    # every input row classified exactly once, sha column present
    assert out.count() == 5
    assert "text_sha" in out.columns


def test_incremental_exact_empty_corpus(spark):
    batch = spark.createDataFrame(
        [(1, "a"), (2, "a")], "doc_id long, text string"
    )
    index = D.corpus_hash_index(batch.limit(0))
    out = D.incremental_exact_dedup(batch, index)
    statuses = {r["doc_id"]: r["dedup_status"] for r in out.collect()}
    assert statuses == {1: "unique", 2: "batch_dup"}


def test_lsh_probe_matches_full_candidate_cross_pairs(spark, sf_dir):
    """Probing a corpus band index with a new batch must find exactly
    the corpus×batch subset of lsh_candidate_pairs over the union —
    the contract that makes the incremental path a safe substitute."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 4 <> 0")
    batch = docs.filter("doc_id % 4 = 0")

    sig_all = D.minhash_signatures(docs, num_hashes=16).cache()
    full = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(sig_all, num_hashes=16, bands=4).collect()
    }
    cross_expected = {
        tuple(sorted(p)) for p in full if (p[0] % 4 == 0) != (p[1] % 4 == 0)
    }

    corpus_index = D.banded_keys(
        D.minhash_signatures(corpus, num_hashes=16), num_hashes=16, bands=4
    )
    new_banded = D.banded_keys(
        D.minhash_signatures(batch, num_hashes=16), num_hashes=16, bands=4
    )
    probed = {
        tuple(sorted((r["id_new"], r["id_corpus"])))
        for r in D.lsh_probe_pairs(new_banded, corpus_index).collect()
    }
    assert probed == cross_expected
    sig_all.unpersist()


def test_lsh_probe_never_pairs_within_batch(spark):
    """Identical new docs pair with corpus members, not each other —
    new-vs-new goes through the regular self-join path instead."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    text = "the quick brown fox jumps over the lazy dog again and again"
    corpus = mk([(1, text)])
    batch = mk([(10, text), (11, text)])
    probe = D.lsh_probe_pairs(
        D.banded_keys(D.minhash_signatures(batch, num_hashes=16)),
        D.banded_keys(D.minhash_signatures(corpus, num_hashes=16)),
    )
    got = {(r["id_new"], r["id_corpus"]) for r in probe.collect()}
    assert got == {(10, 1), (11, 1)}
