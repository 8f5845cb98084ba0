"""Golden-query tests: every registry entry vs its DuckDB oracle.

This replicates the driver's t2 correctness gate locally. Runs at sf0.001
by default (fast); set LDP_TEST_SF_DIR=/root/testdata/sf0.01 to run at
the driver's gate scale.
"""

from __future__ import annotations

import pytest

from legendary_data_pipeline_spark.queries import REGISTRY
from tests.oracle_utils import compare_to_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark_fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare_to_oracle(df, spec.oracle, sf_dir)
