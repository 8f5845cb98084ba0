"""Round-15 perf-fix equivalence pins.

The two r15 probe-caught rewrites must be PURE plan changes — same
values, different physical shape. Pin that directly (the oracle tests
cover the registered queries end-to-end; these target the refactored
operators on adversarial inputs the fixtures may not contain):

1. `hypotests._pooled_two_median` (distributed order statistics)
   must equal ``round(percentile(v, 0.5) * 2)`` — the single-buffer
   aggregate it replaced — on odd/even counts, heavy ties at the
   median, negatives, and a singleton.
2. `similarity.semdedup_fixed` must be salt-invariant: pair_salt=1
   (the old single-task-per-cluster join, modulo the explode) and the
   default 32 must produce identical (vec_id, cluster, keep, dup_of)
   sets — the salt only spreads the kernel, never changes which pairs
   meet.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


CASES = [
    # (name, values)
    ("odd", [1, 2, 3, 4, 5]),
    ("even", [1, 2, 3, 4]),                # half-integer median
    ("ties_at_median", [2, 2, 2, 2, 7, 9]),
    ("all_equal", [5, 5, 5, 5]),
    ("negatives", [-7, -3, -3, 0, 11, 12]),
    ("singleton", [42]),
    ("two", [3, 9]),
    ("skewed_dups", [1] * 9 + [1000]),
]


@pytest.mark.parametrize("name,values", CASES, ids=[c[0] for c in CASES])
def test_pooled_two_median_matches_percentile(spark, name, values):
    from legendary_data_pipeline_spark.operators.hypotests import (
        _pooled_two_median,
    )

    d = spark.createDataFrame([(int(v),) for v in values], "__v long")
    got = _pooled_two_median(d).collect()[0]["__two_med"]
    want = d.agg(
        F.round(F.percentile(F.col("__v"), F.lit(0.5)) * F.lit(2.0))
        .cast("long")
        .alias("m")
    ).collect()[0]["m"]
    assert got == want, f"{name}: two_med {got} != round(2*percentile) {want}"


def test_pooled_two_median_empty(spark):
    from legendary_data_pipeline_spark.operators.hypotests import (
        _pooled_two_median,
    )

    d = spark.createDataFrame([], "__v long")
    rows = _pooled_two_median(d).collect()
    # Same shape as the old percentile aggregate on empty input:
    # one row, NULL value (callers' cells frame is empty anyway).
    assert len(rows) == 1 and rows[0]["__two_med"] is None


def test_semdedup_fixed_salt_invariance(spark):
    from legendary_data_pipeline_spark.catalog import load_table
    from legendary_data_pipeline_spark.operators.similarity import (
        semdedup_fixed,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    tau, nc = 0.35, 16
    base = {
        tuple(r)
        for r in semdedup_fixed(
            emb, n_centroids=nc, tau=tau, pair_salt=1
        ).collect()
    }
    salted = {
        tuple(r)
        for r in semdedup_fixed(
            emb, n_centroids=nc, tau=tau, pair_salt=32
        ).collect()
    }
    assert base == salted
    assert len(base) == emb.count()  # one verdict row per vector
