"""Regression tests for the local oracle harness itself.

Round 6 shipped a red driver cell (`dq_table_checksum`) because
`oracle_utils._norm_cell` collapsed every Decimal through float64 — above
2^53 that erases low bits, so two values differing only in those bits
compared EQUAL locally while the driver's exact hash (correctly) failed.
These tests pin the exact-Decimal contract so the hole cannot reopen.
"""

from decimal import Decimal

from tests.oracle_utils import _norm_cell, normalize_rows


def test_decimals_below_float_precision_are_distinguished():
    # Differ only in the low bits float64 cannot represent at this
    # magnitude: float(a) == float(b) but a != b.
    a = Decimal("8670974658189439324172")
    b = Decimal("8670974658189439324173")
    assert float(a) == float(b)  # the trap the old code fell into
    assert _norm_cell(a) != _norm_cell(b)
    _, ra = normalize_rows([(a,)], ["checksum"])
    _, rb = normalize_rows([(b,)], ["checksum"])
    assert ra != rb


def test_integral_decimal_mirrors_int_branch():
    # Small integral decimals normalize like small ints (via float is
    # fine below 2^52); large ones take the exact-int form, identical to
    # a Python int of the same value so decimal-vs-bigint cells agree.
    assert _norm_cell(Decimal("5")) == _norm_cell(5)
    big = 2**60 + 12345
    assert _norm_cell(Decimal(big)) == _norm_cell(big) == ("i", big)


def test_fractional_decimal_exact_and_scale_insensitive():
    # Same value at different scales must agree; nearby values must not.
    assert _norm_cell(Decimal("1.50")) == _norm_cell(Decimal("1.5"))
    assert _norm_cell(Decimal("1.50")) != _norm_cell(Decimal("1.51"))
    # Exactness beyond float64: 23 significant digits.
    c = Decimal("86709746581894393241.72")
    d = Decimal("86709746581894393241.73")
    assert float(c) == float(d)
    assert _norm_cell(c) != _norm_cell(d)


def test_table_checksum_emits_string(spark):
    # The engine-side fix: the checksum crosses the result boundary as a
    # decimal STRING, immune to any harness's decimal canonicalization.
    from legendary_data_pipeline_spark.operators.profiling import (
        table_checksum,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = table_checksum(df, ["id", "s"])
    assert dict(out.dtypes) == {"n_rows": "bigint", "checksum": "string"}
    row = out.collect()[0]
    assert row.n_rows == 2
    # a plain base-10 integer literal, no sign tricks / exponent forms
    assert row.checksum.isdigit()
