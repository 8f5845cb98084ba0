"""Unit tests for deequ-style profiling (operators/profiling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.profiling import (
    check_constraints,
    check_unique,
    profile_columns,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, 20.0, "b"),
            (3, None, "b"),
            (4, 40.0, None),
            (4, 40.0, "c"),
        ],
        "id long, x double, s string",
    )


def test_profile_counts_and_extremes(df):
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert set(prof) == {"id", "x", "s"}
    assert all(r.n_rows == 5 for r in prof.values())
    assert (prof["id"].n_null, prof["x"].n_null, prof["s"].n_null) == (0, 1, 1)
    assert (prof["id"].n_distinct, prof["x"].n_distinct,
            prof["s"].n_distinct) == (4, 3, 3)
    assert (prof["x"].min_num, prof["x"].max_num) == (10.0, 40.0)
    assert prof["x"].mean == pytest.approx((10 + 20 + 40 + 40) / 4)
    # string column: numeric stats NULL, string min/max populated
    assert prof["s"].min_num is None and prof["s"].mean is None
    assert (prof["s"].min_str, prof["s"].max_str) == ("a", "c")
    # numeric column: string stats NULL
    assert prof["id"].min_str is None
    assert (prof["id"].min_num, prof["id"].max_num) == (1.0, 4.0)


def test_profile_selected_cols_order(df):
    prof = profile_columns(df, ["s", "id"]).collect()
    assert [r.column for r in prof] == ["s", "id"]


def test_profile_approx_distinct(df):
    prof = {
        r.column: r
        for r in profile_columns(df, exact_distinct=False).collect()
    }
    # HLL++ is exact at this cardinality
    assert prof["id"].n_distinct == 4


def test_profile_single_scan_plan(df):
    """N profiled columns must not mean N scans: the exact-distinct plan
    aggregates every column off ONE scan (Spark plans multi-distinct
    aggregates with a single Expand over one relation read)."""
    plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_check_constraints_nulls_are_violations(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, v double"
    )
    rep = {
        r.check_name: r
        for r in check_constraints(
            df,
            {
                "v_positive": F.col("v") > 0,
                "id_not_null": F.col("id").isNotNull(),
            },
        ).collect()
    }
    # v > 0 is NULL for the null row → counts as a violation
    assert rep["v_positive"].n_violations == 2
    assert rep["v_positive"].passed is False
    assert rep["id_not_null"].n_violations == 0
    assert rep["id_not_null"].passed is True
    assert all(r.n_rows == 3 for r in rep.values())


def test_check_unique_counts_extras_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "k long"
    )
    r = check_unique(df, ["k"]).collect()[0]
    # key 1 appears 3× → 2 violations; the NULL-key row → 1 violation
    assert r.check_name == "unique(k)"
    assert (r.n_rows, r.n_violations, r.passed) == (5, 3, False)


def test_check_unique_multi_column(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "a"), (2, None)], "k long, g string"
    )
    r = check_unique(df, ["k", "g"]).collect()[0]
    # (1,a) twice → 1 violation; (2,NULL) has a null key part → 1
    assert (r.n_violations, r.passed) == (2, False)


def test_check_unique_passes_on_unique_keys(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    r = check_unique(df, ["k"]).collect()[0]
    assert (r.n_violations, r.passed) == (0, True)


def test_profile_empty_frame(spark):
    df = spark.createDataFrame([], "id long, s string")
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert prof["id"].n_rows == 0
    assert prof["id"].n_distinct == 0
    assert prof["id"].min_num is None
    assert prof["s"].min_str is None


# ---------------------------------------------------------------------------
# categorical_drift
# ---------------------------------------------------------------------------


def test_drift_identical_distributions_zero_chisq(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        categorical_drift,
    )

    base = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 4, "v string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2, "v string"
    )
    rows = categorical_drift(base, cur, "v").collect()
    assert {r.value for r in rows} == {"a", "b"}
    for r in rows:
        assert r.chisq_contrib == pytest.approx(0.0, abs=1e-12)
        assert r.p_base == pytest.approx(r.p_current)


def test_drift_flags_shifted_and_new_categories(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        categorical_drift,
    )

    base = spark.createDataFrame(
        [("a",)] * 9 + [("b",)] * 1, "v string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 1 + [("b",)] * 4 + [(None,)] * 5, "v string"
    )
    got = {r.value: r for r in categorical_drift(base, cur, "v").collect()}
    assert set(got) == {"a", "b", "<null>"}
    # the appeared-from-nowhere null category has n_base = 0
    assert got["<null>"].n_base == 0 and got["<null>"].n_current == 5
    assert got["<null>"].chisq_contrib > 1.0
    assert got["a"].p_base == pytest.approx(0.9)
    assert got["a"].p_current == pytest.approx(0.1)
    # manual chi-square for 'a': pooled p = 10/20
    eb, ec = 10 * 0.5, 10 * 0.5
    exp = (9 - eb) ** 2 / eb + (1 - ec) ** 2 / ec
    assert got["a"].chisq_contrib == pytest.approx(exp)


# ---------------------------------------------------------------------------
# table_checksum / functional_dependency
# ---------------------------------------------------------------------------


def test_checksum_order_and_partition_independent(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        table_checksum,
    )

    rows = [(1, "a"), (2, "b"), (3, None)]
    df1 = spark.createDataFrame(rows, "id long, s string")
    df2 = spark.createDataFrame(list(reversed(rows)), "id long, s string")
    c1 = table_checksum(df1, ["id", "s"]).collect()[0]
    c2 = table_checksum(df2.repartition(7), ["id", "s"]).collect()[0]
    assert (c1.n_rows, c1.checksum) == (c2.n_rows, c2.checksum)
    # any changed cell changes the checksum
    df3 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "x")], "id long, s string"
    )
    c3 = table_checksum(df3, ["id", "s"]).collect()[0]
    assert c3.checksum != c1.checksum


def test_checksum_null_vs_literal_null_string_differ(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        table_checksum,
    )

    a = spark.createDataFrame([(1, None)], "id long, s string")
    b = spark.createDataFrame([(1, "NULL")], "id long, s string")
    # both canonicalize to the 'NULL' token — a documented limitation of
    # string canonicalization; the separator prevents COLUMN confusion,
    # not value/token collision. Pin the behavior so it's explicit.
    ca = table_checksum(a, ["id", "s"]).collect()[0].checksum
    cb = table_checksum(b, ["id", "s"]).collect()[0].checksum
    assert ca == cb


def test_functional_dependency_holds_and_violations(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        functional_dependency,
    )

    df = spark.createDataFrame(
        [
            (1, "x", "p"),
            (1, "x", "q"),   # same key → same x (holds), two p/q values
            (2, "y", "p"),
            (2, None, "p"),  # key 2 maps to y AND NULL → violates
            (None, "z", "p"),  # NULL lhs excluded
        ],
        "k long, v string, w string",
    )
    r = functional_dependency(df, ["k"], "v").collect()[0]
    assert (r.lhs, r.rhs) == ("k", "v")
    assert r.n_groups == 2
    assert r.n_violating_groups == 1  # key 2: {y, NULL}
    assert r.max_rhs_per_group == 2
    assert r.holds is False

    r2 = functional_dependency(df, ["k", "v"], "w").collect()[0]
    # (1,x) → {p,q} violates; (2,y) → {p} ok; (2,NULL-v) row has
    # non-null lhs parts… v NULL IS dropped? lhs na.drop drops it
    assert r2.n_groups == 2
    assert r2.n_violating_groups == 1


def test_functional_dependency_unique_key_holds(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        functional_dependency,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    r = functional_dependency(df, ["k"], "v").collect()[0]
    assert r.holds is True and r.n_violating_groups == 0


def test_numeric_drift_shared_grid_and_shift(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        numeric_drift,
    )

    base = spark.createDataFrame([(i,) for i in range(100)], "v long")
    shifted = spark.createDataFrame(
        [(i + 50,) for i in range(100)], "v long"
    )
    rows = numeric_drift(
        base, shifted, F.col("v"), n_bins=3
    ).collect()
    # pooled range 0..149 → width ceil(150/3)=50: bins 0..50, 50..100,
    # 100..150 — same grid for both sides
    got = {r.value: (r.n_base, r.n_current) for r in rows}
    assert got == {
        "0..50": (50, 0),
        "50..100": (50, 50),
        "100..150": (0, 50),
    }
    total = sum(r.chisq_contrib for r in rows)
    assert total > 20  # strong shift flagged
    same = numeric_drift(base, base, F.col("v"), n_bins=3).collect()
    assert sum(r.chisq_contrib for r in same) == pytest.approx(0.0)


def test_functional_dependency_vacuous_holds(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        functional_dependency,
    )

    empty = spark.createDataFrame([], "k long, v string")
    r = functional_dependency(empty, ["k"], "v").collect()[0]
    assert (r.n_groups, r.n_violating_groups, r.max_rhs_per_group) == (0, 0, 0)
    assert r.holds is True
    all_null = spark.createDataFrame([(None, "a")], "k long, v string")
    r2 = functional_dependency(all_null, ["k"], "v").collect()[0]
    assert r2.holds is True and r2.n_groups == 0


# ---------------------------------------------------------------------------
# k-anonymity / suppression
# ---------------------------------------------------------------------------


def test_k_anonymity_report_and_suppression(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        k_anonymity_report,
        suppress_below_k,
    )

    rows = (
        [(i, "US", "A", 100.0 + i) for i in range(5)]  # class of 5, diverse
        + [(10 + i, "US", "B", 50.0) for i in range(3)]  # class of 3, l=1
        + [(20, "DE", None, 7.0)]  # NULL quasi value → its own class of 1
        + [(21, "DE", None, 9.0)]  # joins the NULL class → size 2
    )
    df = spark.createDataFrame(
        rows, "id long, country string, segment string, salary double"
    )
    rep = {
        (r["country"], r["segment"]): r
        for r in k_anonymity_report(
            df, ["country", "segment"], k=4, sensitive_col="salary"
        ).collect()
    }
    assert rep[("US", "A")]["class_size"] == 5
    assert not rep[("US", "A")]["at_risk"]
    assert rep[("US", "A")]["l_diversity"] == 5
    assert rep[("US", "B")]["at_risk"]
    assert rep[("US", "B")]["l_diversity"] == 1
    # NULL groups together (one linkable class), not one class per row.
    assert rep[("DE", None)]["class_size"] == 2

    kept = suppress_below_k(df, ["country", "segment"], k=4)
    assert sorted(r["id"] for r in kept.collect()) == [0, 1, 2, 3, 4]
    # Suppression preserves schema.
    assert kept.columns == df.columns


def test_suppression_keeps_null_classes_at_or_above_k(spark):
    """Report and suppression must agree on NULL quasi values: a NULL
    equivalence class of size ≥ k is `at_risk = false` in the report,
    so suppression must retain it (null-safe semi join, not plain `=`).
    """
    from legendary_data_pipeline_spark.operators.profiling import (
        k_anonymity_report,
        suppress_below_k,
    )

    rows = (
        [(i, "US", None, 1.0) for i in range(6)]  # NULL class of 6: safe
        + [(10, "DE", None, 2.0)]  # NULL class of 1: suppressed
        + [(11, "US", "A", 3.0)]  # class of 1: suppressed
        + [(20 + i, None, None, 4.0) for i in range(4)]  # all-NULL, size 4
    )
    df = spark.createDataFrame(
        rows, "id long, country string, segment string, salary double"
    )
    rep = {
        (r["country"], r["segment"]): r["at_risk"]
        for r in k_anonymity_report(df, ["country", "segment"], k=4).collect()
    }
    assert rep[("US", None)] is False
    assert rep[(None, None)] is False
    kept = sorted(
        r["id"]
        for r in suppress_below_k(df, ["country", "segment"], k=4).collect()
    )
    assert kept == [0, 1, 2, 3, 4, 5, 20, 21, 22, 23]


# ---------------------------------------------------------------------------
# write-time expectations
# ---------------------------------------------------------------------------


def test_enforce_expectations_split_and_null_semantics(spark):
    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.operators.profiling import (
        enforce_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 7.0)],
        "id long, amount double",
    )
    passed, failed = enforce_expectations(
        df,
        {
            "amount_positive": F.col("amount") > 0,
            "id_small": F.col("id") < 4,
        },
    )
    assert passed.columns == df.columns
    assert sorted(r["id"] for r in passed.collect()) == [1]
    got = {r["id"]: r["failed_checks"] for r in failed.collect()}
    assert got[2] == ["amount_positive"]
    assert got[3] == ["amount_positive"]  # NULL check result fails strictly
    assert got[4] == ["id_small"]


def test_write_with_expectations_sinks_and_report(spark, tmp_path):
    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.operators.profiling import (
        write_with_expectations,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("v")
    )
    good, quar = str(tmp_path / "good"), str(tmp_path / "quar")
    report = write_with_expectations(
        df, {"v_nonzero": F.col("v") != 0}, good, quar
    )
    rep = {r["check_name"]: r for r in report.collect()}
    assert rep["v_nonzero"]["n_violations"] == 10
    assert not rep["v_nonzero"]["passed"]
    assert spark.read.parquet(good).count() == 90
    q = spark.read.parquet(quar)
    assert q.count() == 10
    assert q.filter(
        F.array_contains("failed_checks", "v_nonzero")
    ).count() == 10

    # Idempotent rerun with all-passing data: quarantine is rewritten empty.
    write_with_expectations(
        df.filter("v != 0"), {"v_nonzero": F.col("v") != 0}, good, quar
    )
    assert spark.read.parquet(quar).count() == 0


def test_schema_drift_statuses(spark):
    from legendary_data_pipeline_spark.operators.profiling import (
        schema_drift,
    )

    old = spark.createDataFrame(
        [], "id long, price decimal(12,2), name string, legacy int"
    )
    new = spark.createDataFrame(
        [], "id long, price decimal(18,2), name string, extra date"
    )
    got = {r["column"]: r for r in schema_drift(old, new).collect()}
    assert got["id"]["status"] == "unchanged"
    assert got["price"]["status"] == "type_changed"
    assert got["price"]["old_type"] == "decimal(12,2)"
    assert got["price"]["new_type"] == "decimal(18,2)"
    assert got["legacy"]["status"] == "removed"
    assert got["extra"]["status"] == "added"
    assert got["extra"]["old_type"] is None


def test_table_diff_statuses(spark):
    from legendary_data_pipeline_spark.operators.profiling import table_diff

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long",
    )
    right = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (4, None, 40), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {r["k"]: r for r in table_diff(left, right, ["k"]).collect()}
    assert got[1]["status"] == "same" and got[1]["changed_cols"] == []
    assert got[2]["status"] == "changed"
    assert got[2]["changed_cols"] == ["s", "v"]
    assert got[2]["l_s"] == "b" and got[2]["r_s"] == "B"
    assert got[3]["status"] == "only_left" and got[3]["changed_cols"] is None
    assert got[5]["status"] == "only_right"
    # NULL == NULL is SAME under null-safe compare.
    assert got[4]["status"] == "same"


def test_table_diff_null_keys_match_null_safely(spark):
    from legendary_data_pipeline_spark.operators.profiling import table_diff

    left = spark.createDataFrame([(None, 1)], "k string, v long")
    right = spark.createDataFrame([(None, 2)], "k string, v long")
    r = table_diff(left, right, ["k"]).first()
    assert r["status"] == "changed" and r["changed_cols"] == ["v"]
