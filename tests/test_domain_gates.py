"""Contracts for the domain-level quality gate (curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.curation import (
    domain_quality_gates,
)


def _scored(spark):
    rows = (
        # good.com: 3/3 high -> passes any floor
        [("good.com", "high")] * 3
        # spammy.net: 2/6 high -> flagged at 95% floor
        + [("spammy.net", "high")] * 2
        + [("spammy.net", "low")] * 4
        # tiny.org: 1/2 high but below min_docs -> never flagged
        + [("tiny.org", "high"), ("tiny.org", "low")]
    )
    return spark.createDataFrame(rows, "source string, quality_bucket string")


def test_flags_bad_domains_only(spark):
    out = domain_quality_gates(_scored(spark), min_docs=5)
    by_dom = {
        r["source"]: r
        for r in out.select(
            "source", "n_docs", "n_good", "domain_flagged", "kept"
        ).distinct().collect()
    }
    assert not by_dom["good.com"]["domain_flagged"]
    assert by_dom["spammy.net"]["domain_flagged"]
    assert not by_dom["tiny.org"]["domain_flagged"]  # under min_docs
    assert by_dom["spammy.net"]["kept"] is False
    assert by_dom["good.com"]["n_good"] == 3


def test_whole_domain_dropped(spark):
    out = domain_quality_gates(_scored(spark), min_docs=5)
    kept_sources = {
        r["source"] for r in out.where("kept").select("source").collect()
    }
    assert kept_sources == {"good.com", "tiny.org"}
    # every spammy.net row dropped, including its individually-high docs
    assert out.where("NOT kept").count() == 6


def test_exact_integer_threshold(spark):
    # 19/20 good = 95.00% -> NOT below a 95% floor (strict <)
    rows = [("edge.com", "high")] * 19 + [("edge.com", "low")]
    df = spark.createDataFrame(rows, "source string, quality_bucket string")
    out = domain_quality_gates(df, min_docs=5)
    assert out.where("domain_flagged").count() == 0


def test_empty_input(spark):
    empty = spark.createDataFrame([], "source string, quality_bucket string")
    assert domain_quality_gates(empty).count() == 0


def test_null_domain_rows_keep_their_own_verdict(spark):
    rows = (
        [(None, "low")] * 6          # NULL domain: 0/6 high -> flagged
        + [("ok.com", "high")] * 5
    )
    df = spark.createDataFrame(rows, "source string, quality_bucket string")
    out = domain_quality_gates(df, min_docs=5)
    assert out.count() == 11  # no silent row loss
    null_rows = out.where(F.col("source").isNull()).collect()
    assert len(null_rows) == 6
    assert all(r["domain_flagged"] for r in null_rows)
    assert out.where("kept").count() == 5
