"""Contract tests for the round-5 curation/embedding operators beyond
their DuckDB-oracle rows: weighted-sampling statistics, boilerplate
stripping semantics, and the centroid plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.curation import (
    boilerplate_span_stats,
    strip_boilerplate,
    weighted_sample_n,
)
from legendary_data_pipeline_spark.operators.similarity import (
    label_centroid_cosine,
)


def _boiler_corpus(spark):
    """3 'sources' x 40 docs; every doc = shared 8-token header + a
    unique 8-token body (span_tokens=4 ⇒ header = spans 0-1)."""
    rows = []
    for s in range(3):
        for i in range(40):
            doc_id = s * 100 + i
            header = f"hdr{s} " * 8
            body = " ".join(f"w{doc_id}x{j}" for j in range(8))
            rows.append((doc_id, header + body))
    # One all-boilerplate doc per source (header only).
    rows += [(s * 100 + 99, ("hdr%d " % s) * 8) for s in range(3)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_stats_and_strip(spark):
    docs = _boiler_corpus(spark)
    stats = {
        r["doc_id"]: r
        for r in boilerplate_span_stats(docs, span_tokens=4).collect()
    }
    # Regular doc: 4 spans, first 2 are the shared header.
    assert stats[0]["n_spans"] == 4
    assert stats[0]["n_boilerplate_spans"] == 2
    assert stats[0]["boilerplate_frac"] == 0.5
    # All-boilerplate doc.
    assert stats[99]["n_boilerplate_spans"] == stats[99]["n_spans"] == 2

    cleaned = {
        r["doc_id"]: r["clean_text"]
        for r in strip_boilerplate(docs, span_tokens=4).collect()
    }
    assert cleaned[0] == " ".join(f"w0x{j}" for j in range(8))
    assert cleaned[99] == ""  # kept, empty — caller decides drop policy


def test_weighted_sample_exact_n_and_weight_bias(spark):
    # 200 light (w=1) + 200 heavy (w=50) docs in one stratum.
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.when(F.col("id") < 200, F.lit(1)).otherwise(F.lit(50)).alias("w"),
    )
    picked = weighted_sample_n(df, 100, weight_col="w", stratum_col="lang")
    rows = picked.collect()
    assert len(rows) == 100
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 101))
    heavy = sum(1 for r in rows if r["doc_id"] >= 200)
    # With 50x weight the heavy half should dominate the draw; under
    # uniform sampling heavy ≈ 50 — even 3-sigma is < 73.
    assert heavy > 80, f"heavy={heavy}, weighting had no effect"
    # Zero/negative/NULL weights are excluded outright.
    df2 = df.withColumn(
        "w", F.when(F.col("doc_id") < 390, F.lit(0)).otherwise(F.col("w"))
    )
    surviving = weighted_sample_n(df2, 100, weight_col="w", stratum_col="lang")
    assert {r["doc_id"] for r in surviving.collect()} == set(range(390, 400))
    # Determinism: identical plan → identical draw.
    again = weighted_sample_n(df, 100, weight_col="w", stratum_col="lang")
    assert {r["doc_id"] for r in again.collect()} == {
        r["doc_id"] for r in rows
    }


def test_centroid_plan_broadcasts_and_flags(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for label in (0, 1):
        center = rng.normal(size=8)
        for i in range(30):
            v = center + rng.normal(scale=0.1, size=8)
            rows.append((label * 100 + i, [float(x) for x in v], label))
    # One far outlier per label (opposite direction of the center).
    base = {r[2]: r[1] for r in rows}
    rows.append((98, [-x for x in base[0]], 0))
    rows.append((99, [-x for x in base[1]], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = label_centroid_cosine(emb, outlier_threshold=0.5)
    flagged = {r["vec_id"] for r in out.filter("is_outlier").collect()}
    assert flagged == {98, 99}
    # The corpus side must join the centroid frame by BROADCAST — the
    # whole point of the plan is that the big side never shuffles.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# winsorize_outliers
# ---------------------------------------------------------------------------

def test_winsorize_ungrouped_bounds_inclusive(spark):
    from legendary_data_pipeline_spark.operators.curation import (
        winsorize_outliers,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])],
        "id long, v double",
    )
    out = {r["id"]: r for r in winsorize_outliers(df, "v", lo=0.1, hi=0.9).collect()}
    # exact interpolated percentiles over 10 values: p10=1.9, p90=9·0.9... 
    # percentile(v,0.9) = 9 + 0.1*(100-9) = 18.1
    assert out[0]["lo_bound"] == 1.9
    assert abs(out[0]["hi_bound"] - 18.1) < 1e-9
    kept = {i for i, r in out.items() if r["keep"]}
    assert kept == {1, 2, 3, 4, 5, 6, 7, 8}  # v=1 below 1.9, v=100 above 18.1
    # schema keeps all original columns plus the three annotations
    assert set(out[0].asDict()) == {"id", "v", "lo_bound", "hi_bound", "keep"}


def test_winsorize_grouped_independent_bounds(spark):
    from legendary_data_pipeline_spark.operators.curation import (
        winsorize_outliers,
    )

    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("b", float(v)) for v in range(101, 111)
    ]
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g string, v double"
    )
    out = winsorize_outliers(df, "v", group_col="g", lo=0.0, hi=1.0).collect()
    # lo=0/hi=1 keeps everything, and each group gets its own bounds
    assert all(r["keep"] for r in out)
    bounds = {(r["g"], r["lo_bound"], r["hi_bound"]) for r in out}
    assert bounds == {("a", 1.0, 10.0), ("b", 101.0, 110.0)}


# ---------------------------------------------------------------------------
# temperature_mix
# ---------------------------------------------------------------------------

def _mix_fixture(spark):
    # lang a: 9000 tokens across 90 docs; lang b: 1000 across 10 docs
    rows = [(i, "a", 100) for i in range(90)] + [
        (100 + i, "b", 100) for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_temperature_alpha1_is_proportional(spark):
    from legendary_data_pipeline_spark.operators.curation import temperature_mix

    out = temperature_mix(_mix_fixture(spark), alpha=1.0, budget_frac=0.5)
    rates = {r["lang"]: r["rate"] for r in out.collect()}
    # alpha=1 -> p_d = n_d/N -> rate_d = budget_frac for every stratum
    assert rates == {"a": 0.5, "b": 0.5}


def test_temperature_alpha0_equalizes_token_share(spark):
    from legendary_data_pipeline_spark.operators.curation import temperature_mix

    out = temperature_mix(_mix_fixture(spark), alpha=0.0, budget_frac=0.5)
    rates = {r["lang"]: r["rate"] for r in out.collect()}
    # alpha=0 -> each stratum targets N*budget/2 = 2500 tokens:
    # a: 2500/9000, b: capped at 1 (2500/1000 > 1)
    assert abs(rates["a"] - 2500 / 9000) < 1e-6
    assert rates["b"] == 1.0


def test_temperature_mix_gate_matches_rate(spark):
    from legendary_data_pipeline_spark.operators.curation import temperature_mix

    out = temperature_mix(
        _mix_fixture(spark), alpha=0.5, budget_frac=0.5
    ).collect()
    # low-resource lang b must be sampled at a HIGHER rate than a
    rates = {r["lang"]: r["rate"] for r in out}
    assert rates["b"] > rates["a"]
    # keep flags are a pure function of (doc_id, rate): rerun identical
    again = {
        r["doc_id"]: r["keep"]
        for r in temperature_mix(
            _mix_fixture(spark), alpha=0.5, budget_frac=0.5
        ).collect()
    }
    assert {r["doc_id"]: r["keep"] for r in out} == again


def test_winsorize_and_mix_keep_null_stratum_rows(spark):
    """NULL group values form their own stratum — rows must be gated,
    never silently dropped by the rate/bounds join."""
    from legendary_data_pipeline_spark.operators.curation import (
        temperature_mix,
        winsorize_outliers,
    )

    rows = [(1, "en", 10), (2, "en", 20), (3, None, 30), (4, None, 40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")

    w = winsorize_outliers(df, "n_tokens", group_col="lang", lo=0.0, hi=1.0)
    assert w.count() == 4
    null_bounds = {
        (r["lo_bound"], r["hi_bound"])
        for r in w.filter("lang IS NULL").collect()
    }
    assert null_bounds == {(30.0, 40.0)}  # own stratum, own bounds

    m = temperature_mix(df, alpha=1.0, budget_frac=1.0)
    assert m.count() == 4
    assert all(r["rate"] == 1.0 for r in m.collect())


# ---------------------------------------------------------------------------
# sliding_chunks
# ---------------------------------------------------------------------------

def test_sliding_chunks_coverage_and_overlap(spark):
    from legendary_data_pipeline_spark.operators.curation import sliding_chunks

    toks = [f"t{i}" for i in range(1, 11)]  # 10 tokens
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = sorted(
        sliding_chunks(df, size_tokens=8, stride_tokens=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # upper = min(max(1, 10-8+4), 10) = 6 -> starts {1, 5}; the start-9
    # tail chunk (tokens 9-10, fully inside chunk 5-10) is NOT emitted
    assert [(r["start_pos"], r["n_chunk_tokens"]) for r in out] == [
        (1, 8),
        (5, 6),
    ]
    assert out[0]["chunk_text"].split() == toks[0:8]
    assert out[1]["chunk_text"].split() == toks[4:10]
    # full coverage: union of chunks = all tokens
    covered = set(out[0]["chunk_text"].split()) | set(out[1]["chunk_text"].split())
    assert covered == set(toks)


def test_sliding_chunks_short_doc_single_chunk(spark):
    from legendary_data_pipeline_spark.operators.curation import sliding_chunks

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = sliding_chunks(df, size_tokens=8, stride_tokens=4).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "a b c" and out[0]["n_chunk_tokens"] == 3


def test_sliding_chunks_gap_stride(spark):
    from legendary_data_pipeline_spark.operators.curation import sliding_chunks

    # stride > size: sampling with gaps — starts run to the doc end
    toks = [f"t{i}" for i in range(1, 11)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = sorted(
        sliding_chunks(df, size_tokens=2, stride_tokens=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["start_pos"], r["n_chunk_tokens"]) for r in out] == [
        (1, 2), (5, 2), (9, 2),
    ]


# ---------------------------------------------------------------------------
# leakage-safe split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_keeps_clusters_together(spark):
    from legendary_data_pipeline_spark.operators.curation import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # 40 docs in 10 clusters of 4 (component = min member), rest singleton.
    comps = spark.createDataFrame(
        [(c * 4 + j, c * 4) for c in range(10) for j in range(4)],
        "node long, component long",
    )
    out = leakage_safe_split(docs, comps, val_pct=30, seed=7)
    rows = out.collect()
    assert len(rows) == 200
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group_key"], set()).add(r["split"])
    # No cluster straddles the boundary.
    assert all(len(s) == 1 for s in by_group.values())
    # Cluster members share the component's group_key; singletons their own.
    keyed = {r["doc_id"]: r["group_key"] for r in rows}
    assert keyed[5] == 4 and keyed[39] == 36 and keyed[150] == 150
    # Both sides populated at val_pct=30 over ~170 groups.
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val"}
    # Deterministic under repartitioning.
    again = {
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(
            docs.repartition(13), comps, val_pct=30, seed=7
        ).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in rows}


def test_leakage_safe_split_string_ids(spark):
    """Non-long id types flow through: group keys keep the id's type
    instead of silently null-ing under a long cast."""
    from legendary_data_pipeline_spark.operators.curation import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(f"doc-{i}", "t") for i in range(20)], "doc_id string, text string"
    )
    comps = spark.createDataFrame(
        [("doc-1", "doc-0"), ("doc-0", "doc-0")],
        "node string, component string",
    )
    rows = {r["doc_id"]: r for r in leakage_safe_split(docs, comps).collect()}
    assert rows["doc-1"]["group_key"] == "doc-0"
    assert rows["doc-5"]["group_key"] == "doc-5"
    assert rows["doc-0"]["split"] == rows["doc-1"]["split"]
    assert all(r["split"] in ("train", "val") for r in rows.values())
