"""connected_components: correctness on shapes LSH dup graphs don't
exercise (long chains = high diameter), convergence, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from legendary_data_pipeline_spark.operators.graph import (
    canonical_members,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _collect(df):
    return sorted((r["node"], r["component"]) for r in df.collect())


def test_chain_and_clique_and_isolated_pair(spark):
    # chain 1-2-3-4-5 (diameter 4), clique {10,11,12}, pair {20,21}
    edges = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (21, 20)],
    )
    got = _collect(connected_components(edges))
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    ]


def test_label_flows_against_edge_direction(spark):
    # min id at the "end" of a directed-looking chain: 5-4, 4-3, 3-2, 2-1
    edges = _edges(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    got = _collect(connected_components(edges))
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)]


def test_max_iterations_guard(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2)


def test_canonical_members_summary(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    comps = connected_components(edges)
    rows = sorted(
        (r["component"], r["n_members"], r["canonical_id"])
        for r in canonical_members(comps).collect()
    )
    assert rows == [(1, 3, 1), (10, 2, 10)]
