"""Hand-computed contracts for the round-13 composite readouts
(X228–X233): the gate-attrition funnel, the duplicate-cluster size
profile, the keeper-policy delta report, the temperature-mix bias
audit, the IVF list-balance profile, and the packing-efficiency
report."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# the registry package must initialize before any queries_* submodule
# is imported directly (rotation-time import-order contract)
import legendary_data_pipeline_spark.queries  # noqa: F401

from tests.conftest import SF_DIR


def _round_half_up(x: float) -> int:
    """Replays Spark F.round's HALF_UP tie rule for positive values —
    Python's round() is banker's half-even and diverges on exactly-
    representable .5 ties (e.g. power-of-two denominators)."""
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# X228 — gate_funnel_report (operator-level, hand-computed)
# ---------------------------------------------------------------------------


def _funnel_fixture(spark):
    # 5 rows; stage A keeps w>=10, stage B keeps flag, one NULL flag.
    # Hand funnel: n0=5, t0=10+20+30+40+5=105
    #   A: keeps w in {10,20,30,40} -> n1=4, t1=100
    #   B: flag True for w=10,20; False for 30; NULL for 40
    #      -> n2=2, t2=30 (NULL counts as drop)
    return spark.createDataFrame(
        [
            (1, 10, True),
            (2, 20, True),
            (3, 30, False),
            (4, 40, None),
            (5, 5, True),
        ],
        "id long, w long, flag boolean",
    )


def test_gate_funnel_hand_computed(spark):
    from legendary_data_pipeline_spark.operators.curation import (
        gate_funnel_report,
    )

    out = gate_funnel_report(
        _funnel_fixture(spark),
        [("a_weight", F.col("w") >= 10), ("b_flag", F.col("flag"))],
        weight_col="w",
    )
    rows = {r["stage"]: r for r in out.collect()}
    a, b = rows["a_weight"], rows["b_flag"]
    assert (a["stage_idx"], a["docs_in"], a["docs_dropped"], a["docs_out"]) \
        == (1, 5, 1, 4)
    assert (a["tokens_in"], a["tokens_dropped"], a["tokens_out"]) \
        == (105, 5, 100)
    assert a["doc_survival_frac"] == 4.0 / 5.0
    assert a["token_survival_frac"] == 100.0 / 105.0
    # NULL condition counts as a drop (row id=4)
    assert (b["stage_idx"], b["docs_in"], b["docs_dropped"], b["docs_out"]) \
        == (2, 4, 2, 2)
    assert (b["tokens_in"], b["tokens_dropped"], b["tokens_out"]) \
        == (100, 70, 30)


def test_gate_funnel_hostile_stage_names(spark):
    """Caller-supplied stage names pass through the generated stack()
    literal intact: embedded quotes, backslashes (Spark's literal
    parser treats \\ as an escape), and a trailing backslash."""
    from legendary_data_pipeline_spark.operators.curation import (
        gate_funnel_report,
    )

    names = ["can't parse", r"pass_no_\d", "trailing\\"]
    out = gate_funnel_report(
        _funnel_fixture(spark),
        [(n, F.col("w") >= 10) for n in names],
    )
    got = [r["stage"] for r in sorted(out.collect(), key=lambda r: r["stage_idx"])]
    assert got == names


def test_gate_funnel_no_weight_and_empty_stages(spark):
    from legendary_data_pipeline_spark.operators.curation import (
        gate_funnel_report,
    )

    out = gate_funnel_report(
        _funnel_fixture(spark), [("a", F.col("w") >= 10)]
    )
    assert "tokens_in" not in out.columns
    r = out.collect()[0]
    assert (r["docs_in"], r["docs_out"]) == (5, 4)
    with pytest.raises(ValueError):
        gate_funnel_report(_funnel_fixture(spark), [])


def test_gate_funnel_query_internal_consistency(spark):
    """The registered funnel's stages chain: stage i's docs_out equals
    stage i+1's docs_in (same for tokens), counts are non-negative and
    monotone non-increasing."""
    from legendary_data_pipeline_spark.queries_curation import (
        curation_gate_funnel,
    )

    rows = sorted(
        curation_gate_funnel(spark, SF_DIR).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "gopher_quality", "c4_rules", "pii_screen",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs_in"] == prev["docs_out"]
        assert cur["tokens_in"] == prev["tokens_out"]
    for r in rows:
        assert r["docs_in"] == r["docs_dropped"] + r["docs_out"]
        assert r["tokens_in"] == r["tokens_dropped"] + r["tokens_out"]
        assert 0 <= r["doc_survival_frac"] <= 1.0


# ---------------------------------------------------------------------------
# X229 — dedup_cluster_size_profile
# ---------------------------------------------------------------------------


def test_cluster_size_profile_consistency(spark):
    """The histogram's totals replay the closure it summarizes: every
    cluster has >= 2 members, n_docs/n_droppable are exact products,
    and the doc total equals the component frame's row count."""
    from legendary_data_pipeline_spark.queries_llm import (
        _dup_components,
        dedup_cluster_size_profile,
    )
    from legendary_data_pipeline_spark.catalog import load_table

    rows = dedup_cluster_size_profile(spark, SF_DIR).collect()
    assert rows, "fixture corpus has near-dup clusters by construction"
    for r in rows:
        assert r["cluster_size"] >= 2  # components exist only for pairs
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_droppable"] == (r["cluster_size"] - 1) * r["n_clusters"]
    docs = load_table(spark, SF_DIR, "documents")
    n_members = _dup_components(docs).count()
    assert sum(r["n_docs"] for r in rows) == n_members


# ---------------------------------------------------------------------------
# X231 — curation_mix_bias_report
# ---------------------------------------------------------------------------


def test_mix_bias_report_contracts(spark):
    """X231: shares sum to ~1e6 per axis, kept counts bound corpus
    counts, and the temperature target ORDERS strata correctly —
    alpha<1 up-weights low-resource langs, so target_share > corpus
    share exactly for the below-average strata and the realized kept
    share moves FROM the corpus share TOWARD the target."""
    from legendary_data_pipeline_spark.queries_curation import (
        curation_mix_bias_report,
    )

    rows = curation_mix_bias_report(spark, SF_DIR).collect()
    assert len(rows) >= 2
    for col in ("share_corpus_e6", "target_share_e6", "share_kept_e6"):
        total = sum(r[col] for r in rows)
        assert abs(total - 1_000_000) <= len(rows)  # rounding slack
    for r in rows:
        assert 0 <= r["docs_kept"] <= r["docs_corpus"]
        assert 0 <= r["tokens_kept"] <= r["tokens_corpus"]
        assert 0 < r["rate_e6"] <= 1_000_000
    # temperature flattening: the largest stratum is down-weighted
    big = max(rows, key=lambda r: r["tokens_corpus"])
    small = min(rows, key=lambda r: r["tokens_corpus"])
    assert big["target_share_e6"] < big["share_corpus_e6"]
    assert small["target_share_e6"] > small["share_corpus_e6"]


# ---------------------------------------------------------------------------
# X232 — sim_ivf_list_balance
# ---------------------------------------------------------------------------


def test_ivf_list_balance_contracts(spark):
    """X232: exactly n_centroids rows, sizes sum to the corpus, the
    share/load columns replay their defining ratios, and the profile's
    totals agree with the assignment the topk index uses."""
    from legendary_data_pipeline_spark.catalog import load_table
    from legendary_data_pipeline_spark.queries_llm import (
        _IVFX_NC,
        sim_ivf_list_balance,
    )

    rows = sim_ivf_list_balance(spark, SF_DIR).collect()
    assert len(rows) == _IVFX_NC
    assert len({r["cid"] for r in rows}) == _IVFX_NC
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["list_size"] for r in rows) == n
    for r in rows:
        assert r["share_e6"] == _round_half_up(r["list_size"] / n * 1e6)
        assert r["load_factor_e6"] == _round_half_up(
            r["list_size"] * float(_IVFX_NC) / n * 1e6
        )


# ---------------------------------------------------------------------------
# X233 — curation_pack_efficiency
# ---------------------------------------------------------------------------


def test_pack_efficiency_vs_pack_sequences(spark):
    """X233: the efficiency rollup replays curation_pack_sequences'
    pack frame exactly — per-lang pack counts, token totals, extreme
    pack sizes, and the overflow/underfull split."""
    from legendary_data_pipeline_spark.queries_curation import (
        _PACK_BUDGET,
        curation_pack_efficiency,
        curation_pack_sequences,
    )

    eff = {r["lang"]: r for r in curation_pack_efficiency(spark, SF_DIR).collect()}
    packs: dict[str, list] = {}
    for r in curation_pack_sequences(spark, SF_DIR).collect():
        packs.setdefault(r["lang"], []).append(r)
    assert set(eff) == set(packs)
    for lang, ps in packs.items():
        e = eff[lang]
        toks = [p["pack_tokens"] for p in ps]
        assert e["n_packs"] == len(ps)
        assert e["n_docs"] == sum(p["n_docs"] for p in ps)
        assert e["tokens_total"] == sum(toks)
        assert e["min_pack_tokens"] == min(toks)
        assert e["max_pack_tokens"] == max(toks)
        assert e["n_overflow_packs"] == sum(t > _PACK_BUDGET for t in toks)
        assert e["n_underfull_packs"] == sum(t < _PACK_BUDGET for t in toks)
        assert e["fill_mean_e6"] == _round_half_up(
            sum(toks) / (len(ps) * float(_PACK_BUDGET)) * 1e6
        )


# ---------------------------------------------------------------------------
# X230 — dedup_keeper_policy_delta
# ---------------------------------------------------------------------------


def test_keeper_policy_delta_vs_keep_longest(spark):
    """The delta report's longest-policy totals replay
    dedup_keep_longest exactly, the canonical side replays
    min-id keeper chars, and the gain is their difference (>= 0 by
    construction: the longest member is at least as long as any)."""
    from legendary_data_pipeline_spark.queries_llm import (
        dedup_keep_longest,
        dedup_keeper_policy_delta,
    )

    delta = dedup_keeper_policy_delta(spark, SF_DIR).collect()[0]
    longest = dedup_keep_longest(spark, SF_DIR).collect()
    assert delta["n_clusters"] == len(longest)
    assert delta["chars_longest_policy"] == sum(
        r["keep_chars"] for r in longest
    )
    assert delta["chars_gained"] == (
        delta["chars_longest_policy"] - delta["chars_canonical_policy"]
    )
    assert delta["chars_gained"] >= 0
    assert 0 <= delta["n_keeper_differs"] <= delta["n_clusters"]
    if delta["n_clusters"]:
        assert delta["frac_clusters_differ"] == (
            delta["n_keeper_differs"] / delta["n_clusters"]
        )
