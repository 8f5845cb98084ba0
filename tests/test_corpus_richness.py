"""Contracts for vocabulary richness, corpus entropy, and ACF
(X191-X193; operators/textstats.py `vocab_richness`/`corpus_entropy`,
operators/stats.py `autocorrelation`)."""

from __future__ import annotations

import math

import pytest

from legendary_data_pipeline_spark.operators.stats import autocorrelation
from legendary_data_pipeline_spark.operators.textstats import (
    corpus_entropy,
    vocab_richness,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def _series(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, v long")


# ---------------------------------------------------------------------------
# vocab_richness
# ---------------------------------------------------------------------------


def test_vocab_richness_hand_computed(spark):
    # tokens: a:2 b:2 c:1 d:1 -> N=6 V=4 f1=2 f2=2
    # chao1 = 4 + 2*2/(2*2) = 5.0; gt_unseen = 2/6
    rows = [("s1", "a b a c"), ("s1", "b d")]
    out = vocab_richness(_docs(spark, rows)).collect()[0]
    assert (out.n_tokens, out.vocab, out.hapax, out.doubletons) == (6, 4, 2, 2)
    assert out.chao1 == 5.0
    assert out.gt_unseen == 2.0 / 6.0


def test_vocab_richness_bias_corrected_when_no_doubletons(spark):
    # a:3 b:1 -> f1=1 f2=0 -> chao1 = V + f1(f1-1)/2 = 2.0
    rows = [("s1", "a a a b")]
    out = vocab_richness(_docs(spark, rows)).collect()[0]
    assert out.doubletons == 0 and out.chao1 == 2.0


def test_vocab_richness_sources_isolated(spark):
    rows = [("s1", "a a"), ("s2", "x y z")]
    out = {r.source: r for r in vocab_richness(_docs(spark, rows)).collect()}
    assert out["s1"].vocab == 1 and out["s1"].hapax == 0
    assert out["s2"].vocab == 3 and out["s2"].hapax == 3
    # all-hapax slice: Chao1 falls back to the bias-corrected form
    assert out["s2"].chao1 == 3.0 + 3.0 * 2.0 / 2.0


# ---------------------------------------------------------------------------
# corpus_entropy
# ---------------------------------------------------------------------------


def test_corpus_entropy_hand_computed(spark):
    # "a b a b a": unigrams a:3 b:2, N=5; bigrams ab:2 ba:2, N2=4;
    # ctx a:2 b:2 -> h2 = hctx = ln2 -> h_cond = 0;
    # h1 = ln5 - (3ln3 + 2ln2)/5; redundancy = 1 - h1/ln2 (V=2)
    rows = [("s1", "a b a b a")]
    out = corpus_entropy(_docs(spark, rows)).collect()[0]
    h1 = math.log(5) - (3 * math.log(3) + 2 * math.log(2)) / 5
    assert out.n_tokens == 5 and out.n_bigrams == 4
    assert out.h1_e6 == round(h1 * 1e6)
    assert out.h2_e6 == round(math.log(2) * 1e6)
    assert out.h_cond_e6 == 0
    assert out.redundancy_e6 == round((1 - h1 / math.log(2)) * 1e6)


def test_corpus_entropy_uniform_vs_repetitive(spark):
    # uniform vocabulary use -> redundancy 0; single repeated token ->
    # h1 = 0, redundancy NULL (V < 2), no bigram entropy signal
    rows = [("u", "a b c d"), ("r", "x x x x")]
    out = {r.source: r for r in corpus_entropy(_docs(spark, rows)).collect()}
    assert out["u"].h1_e6 == round(math.log(4) * 1e6)
    assert out["u"].redundancy_e6 == 0
    assert out["r"].h1_e6 == 0 and out["r"].redundancy_e6 is None
    assert out["r"].h2_e6 == 0  # xx bigram repeated -> zero entropy


def test_corpus_entropy_short_docs_no_bigrams(spark):
    rows = [("s", "one"), ("s", "two")]
    out = corpus_entropy(_docs(spark, rows)).collect()[0]
    assert out.n_bigrams == 0
    assert out.h2_e6 is None and out.h_cond_e6 is None


# ---------------------------------------------------------------------------
# autocorrelation
# ---------------------------------------------------------------------------


def test_acf_linear_series_perfect(spark):
    rows = [("a", t, t + 1) for t in range(5)]
    out = {
        r.lag: r
        for r in autocorrelation(
            _series(spark, rows), "t", "v", group_cols=["g"], max_lag=2
        ).collect()
    }
    assert out[1].n == 4 and out[1].r_e6 == 1_000_000
    assert out[2].n == 3 and out[2].r_e6 == 1_000_000


def test_acf_alternating_series(spark):
    rows = [("a", t, 1 if t % 2 == 0 else 5) for t in range(6)]
    out = {
        r.lag: r
        for r in autocorrelation(
            _series(spark, rows), "t", "v", group_cols=["g"], max_lag=2
        ).collect()
    }
    assert out[1].r_e6 == -1_000_000
    assert out[2].r_e6 == 1_000_000


def test_acf_gaps_and_degenerate(spark):
    # gap at t=2: lag-1 pairs only (0,1) and (3,4); constant series ->
    # zero variance -> NULL
    rows = [("a", 0, 1), ("a", 1, 2), ("a", 3, 4), ("a", 4, 8),
            ("c", 0, 7), ("c", 1, 7), ("c", 2, 7)]
    out = {
        (r.g, r.lag): r
        for r in autocorrelation(
            _series(spark, rows), "t", "v", group_cols=["g"], max_lag=1
        ).collect()
    }
    assert out[("a", 1)].n == 2
    assert out[("c", 1)].r_e6 is None
    with pytest.raises(ValueError, match="max_lag"):
        autocorrelation(_series(spark, rows), "t", "v", max_lag=0)


# ---------------------------------------------------------------------------
# vocab_coverage_points (X195)
# ---------------------------------------------------------------------------


def test_coverage_points_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        vocab_coverage_points,
    )

    # counts a:6 b:3 c:1 -> N=10; T50=5 -> 1 type (a covers 6);
    # T90=9 -> 2 types; T99=ceil(9.9)=10 -> all 3
    rows = [("s", "a a a a a a b b b c")]
    out = vocab_coverage_points(_docs(spark, rows)).collect()[0]
    assert (out.n_tokens, out.vocab) == (10, 3)
    assert (out.types_p50, out.types_p90, out.types_p99) == (1, 2, 3)


def test_coverage_points_within_class_partial(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        vocab_coverage_points,
    )

    # four types each with count 2 (one class): N=8, T50=4 -> 2 of the
    # 4 same-count types; T90=ceil(7.2)=8 -> all 4
    rows = [("s", "a a b b c c d d")]
    out = vocab_coverage_points(_docs(spark, rows)).collect()[0]
    assert out.types_p50 == 2 and out.types_p90 == 4 and out.types_p99 == 4


def test_coverage_points_sources_isolated(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        vocab_coverage_points,
    )

    rows = [("s1", "x x x x y"), ("s2", "p q r s")]
    out = {
        r.source: r
        for r in vocab_coverage_points(_docs(spark, rows)).collect()
    }
    assert out["s1"].types_p50 == 1  # x alone covers 4/5
    assert out["s2"].types_p50 == 2  # uniform: 2 of 4


# ---------------------------------------------------------------------------
# zipf_fit (X196)
# ---------------------------------------------------------------------------


def test_zipf_fit_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.textstats import zipf_fit

    # classes: (c=4, m=1, above=0 -> midrank 1), (c=2, m=2, above=1 ->
    # midrank 2.5), (c=1, m=1, above=3 -> midrank 4); weighted OLS of
    # y=ln c on x=ln midrank, weights m
    rows = [("s", "a a a a b b c c d")]
    out = zipf_fit(_docs(spark, rows)).collect()[0]
    pts = [(math.log(1.0), math.log(4.0), 1.0),
           (math.log(2.5), math.log(2.0), 2.0),
           (math.log(4.0), math.log(1.0), 1.0)]
    sw = sum(w for _, _, w in pts)
    swx = sum(w * x for x, _, w in pts)
    swy = sum(w * y for _, y, w in pts)
    swxx = sum(w * x * x for x, _, w in pts)
    swyy = sum(w * y * y for _, y, w in pts)
    swxy = sum(w * x * y for x, y, w in pts)
    num = sw * swxy - swx * swy
    slope = num / (sw * swxx - swx * swx)
    intercept = (swy - slope * swx) / sw
    r2 = num * num / ((sw * swxx - swx * swx) * (sw * swyy - swy * swy))
    assert out.n_classes == 3 and out.vocab == 4
    assert out.slope_e6 == round(slope * 1e6)
    assert out.intercept_e6 == round(intercept * 1e6)
    assert out.r2_e6 == round(r2 * 1e6)
    assert out.slope_e6 < 0  # frequency falls with rank


def test_zipf_fit_degenerate_single_class(spark):
    from legendary_data_pipeline_spark.operators.textstats import zipf_fit

    rows = [("s", "a a b b")]  # one count class -> no fit
    out = zipf_fit(_docs(spark, rows)).collect()[0]
    assert out.n_classes == 1
    assert out.slope_e6 is None and out.r2_e6 is None


# ---------------------------------------------------------------------------
# source_cosine_matrix (X200)
# ---------------------------------------------------------------------------


def test_source_cosine_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        source_cosine_matrix,
    )

    # s1 = {a:2, b:1}, s2 = {a:1, b:2}: dot = 4, norms = sqrt5 each
    # -> cos = 4/5; s3 shares no token -> its pairs are absent
    rows = [("s1", "a a b"), ("s2", "a b b"), ("s3", "z z")]
    out = {
        (r.source_a, r.source_b): r
        for r in source_cosine_matrix(_docs(spark, rows)).collect()
    }
    assert set(out) == {("s1", "s2")}
    assert out[("s1", "s2")].dot == 4
    assert out[("s1", "s2")].cos_e6 == 800_000


def test_source_cosine_identical_sources(spark):
    from legendary_data_pipeline_spark.operators.textstats import (
        source_cosine_matrix,
    )

    rows = [("s1", "x y x"), ("s2", "x y x")]
    out = source_cosine_matrix(_docs(spark, rows)).collect()[0]
    assert out.cos_e6 == 1_000_000


# ---------------------------------------------------------------------------
# label_centroid_matrix (X206)
# ---------------------------------------------------------------------------


def test_label_centroid_matrix_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.similarity import (
        label_centroid_matrix,
    )

    # label 0 centroid = (1, 0); label 1 centroid = (0, 1) ->
    # orthogonal, cos 0; label 2 centroid = (1, 0) -> cos 1 with l0
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1), (4, [0.0, 1.0], 1),
        (5, [2.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        (r.label_a, r.label_b): r.cos_e6
        for r in label_centroid_matrix(df).collect()
    }
    assert out[(0, 1)] == 0
    assert out[(0, 2)] == 1_000_000
    assert out[(1, 2)] == 0


def test_coverage_points_colliding_targets_raise(spark):
    import pytest as _pt

    from legendary_data_pipeline_spark.operators.textstats import (
        vocab_coverage_points,
    )

    with _pt.raises(ValueError, match="10k-ppm"):
        vocab_coverage_points(
            _docs(spark, [("s", "a b")]),
            targets_ppm=(900_000, 905_000),
        )
