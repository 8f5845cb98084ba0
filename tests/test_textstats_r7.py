"""Round-7 text/embedding hygiene contracts: n-gram novelty and the
embedding quality report."""

from __future__ import annotations


def test_novelty_unique_vs_copied_docs(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),       # unique trigrams
            (2, "red green blue yellow"),        # unique trigrams
            (3, "red green blue yellow"),        # exact copy of 2
            (4, "red green blue purple orange"), # shares 1 of 3 shingles w/ 2,3
            (5, "hi"),                           # too short — no shingles
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # doc 1: both trigrams unseen elsewhere → novelty 1
    assert out[1]["novelty"] == 1.0 and out[1]["n_shingles"] == 2
    # docs 2/3 are copies: every shingle has df=2 → novelty 0
    assert out[2]["novelty"] == 0.0 and out[3]["novelty"] == 0.0
    # doc 4: shingles = {red green blue, green blue purple, blue purple
    # orange}; only the first is shared → novelty 2/3
    assert out[4]["n_shingles"] == 3 and out[4]["n_novel"] == 2
    assert out[4]["novelty"] == 2.0 / 3.0
    # doc 5: no shingles → 0 count, NULL novelty (not 0 — unknown, not dup)
    assert out[5]["n_shingles"] == 0 and out[5]["novelty"] is None


def test_novelty_internal_repetition_not_masked(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        ngram_novelty,
    )

    # A doc repeating its own trigram still counts it ONCE (distinct per
    # doc), so self-repetition doesn't inflate df past 1.
    docs = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    r = ngram_novelty(docs).collect()[0]
    # shingles: "a b c","b c a","c a b","a b c" → distinct 3, all df=1
    assert r["n_shingles"] == 3 and r["novelty"] == 1.0


def test_embedding_quality_flags_every_failure_mode(spark):
    import math

    from legendary_data_pipeline_spark.operators.similarity import (
        embedding_quality_report,
    )

    rows = [
        ("ok", [3.0, 4.0]),            # norm 5
        ("ok", [0.0, 0.0]),            # zero norm (clean but degenerate)
        ("ok", None),                  # NULL vector
        ("ok", [1.0]),                 # wrong dim
        ("ok", [float("nan"), 1.0]),   # NaN
        ("ok", [float("inf"), 1.0]),   # Inf
        (None, [1.0, 0.0]),            # NULL label forms its own row
    ]
    df = spark.createDataFrame(
        rows, "label string, embedding array<double>"
    )
    out = {
        r["label"]: r
        for r in embedding_quality_report(df, expected_dim=2).collect()
    }
    ok = out["ok"]
    assert ok["n_vectors"] == 6
    assert ok["n_null_vec"] == 1
    assert ok["n_wrong_dim"] == 1
    assert ok["n_nonfinite"] == 2
    assert ok["n_zero_norm"] == 1
    # clean vectors: [3,4] (norm 5) and [0,0] → min 0, max 5e6
    assert ok["min_norm_micro"] == 0
    assert ok["max_norm_micro"] == 5_000_000
    assert ok["avg_norm_micro"] == 2_500_000
    nul = out[None]
    assert nul["n_vectors"] == 1 and nul["min_norm_micro"] == 1_000_000
    assert math.isfinite(nul["avg_norm_micro"])


def test_embedding_quality_all_bad_group_has_null_stats(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        embedding_quality_report,
    )

    df = spark.createDataFrame(
        [("bad", None), ("bad", [1.0, 2.0, 3.0])],
        "label string, embedding array<double>",
    )
    r = embedding_quality_report(df, expected_dim=2).collect()[0]
    assert r["n_vectors"] == 2
    assert r["n_null_vec"] == 1 and r["n_wrong_dim"] == 1
    assert r["min_norm_micro"] is None
    assert r["avg_norm_micro"] is None


def test_script_profile_multilingual_and_nulls(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        script_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world"),                    # latin + space
            (2, "привет мир"),                     # cyrillic
            (3, "你好 世界 2024"),                  # cjk + digits
            (4, "مرحبا"),                          # arabic
            (5, "한국어 텍스트"),                    # hangul
            (6, "γειά σου"),                       # greek
            (7, "mixed Привет hello"),             # latin 10 vs cyrillic 6
            (8, ""),                               # empty
            (9, None),                             # NULL text
            (10, "!!!???"),                        # nothing classified
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in script_profile(docs).collect()}
    assert out[1]["dominant_script"] == "latin" and out[1]["latin"] == 10
    assert out[2]["dominant_script"] == "cyrillic"
    assert out[3]["cjk"] == 4 and out[3]["digit"] == 4
    assert out[4]["dominant_script"] == "arabic"
    assert out[5]["dominant_script"] == "hangul"
    assert out[6]["dominant_script"] == "greek"
    assert out[7]["dominant_script"] == "latin"
    assert out[7]["cyrillic"] == 6
    for d in (8, 9):
        assert out[d]["n_chars"] == 0
        assert out[d]["dominant_script"] is None
    assert out[10]["other"] == 6
    assert out[10]["dominant_script"] == "other"
    # counts partition the text exactly
    for d, r in out.items():
        total = sum(
            r[c] for c in (
                "latin", "cyrillic", "greek", "arabic", "cjk", "hangul",
                "digit", "space", "other",
            )
        )
        assert total == r["n_chars"], d
