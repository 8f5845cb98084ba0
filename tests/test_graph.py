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


def test_max_iterations_guard_propagation(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2, algorithm="propagation")


def _chain(n, base=0):
    return [(base + i, base + i + 1) for i in range(n - 1)]


def test_star_solves_long_chain_in_log_rounds(spark):
    # 200-node path: diameter 199. Propagation needs 199 rounds; star
    # must finish within a 12-round budget (~2·log2 n) or the O(log n)
    # contract is broken.
    edges = _edges(spark, _chain(200, base=1000))
    got = _collect(connected_components(edges, max_iterations=12, algorithm="star"))
    assert got == [(1000 + i, 1000) for i in range(200)]


def test_star_matches_propagation_on_mixed_shapes(spark):
    # chain + clique + pair + self-loop-only node, shuffled ids
    pairs = (
        _chain(30, base=500)
        + [(7, 9), (9, 3), (3, 7), (3, 9)]
        + [(101, 100)]
        + [(42, 42)]
    )
    edges = _edges(spark, pairs)
    star = _collect(connected_components(edges, algorithm="star"))
    prop = _collect(
        connected_components(edges, max_iterations=40, algorithm="propagation")
    )
    assert star == prop


def test_auto_switches_to_star_on_high_diameter(spark):
    # Propagation alone would need 299 rounds — far over the 25-round
    # budget. auto must detect the stalled frontier and finish via star.
    edges = _edges(spark, _chain(300, base=1))
    got = _collect(connected_components(edges, max_iterations=25))
    assert got == [(1 + i, 1) for i in range(300)]


def test_auto_near_clique_stays_on_propagation_path(spark):
    # Near-clique graphs converge in 1-2 rounds; result identical.
    edges = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    got = _collect(connected_components(edges))
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def test_rejects_unknown_algorithm(spark):
    edges = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(edges, algorithm="bfs")


def test_canonical_members_summary(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    comps = connected_components(edges)
    rows = sorted(
        (r["component"], r["n_members"], r["canonical_id"])
        for r in canonical_members(comps).collect()
    )
    assert rows == [(1, 3, 1), (10, 2, 10)]


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from legendary_data_pipeline_spark.operators.graph import pagerank

    # Directed graph with a dangling node (3) and a hub (0).
    E = [(0, 1), (0, 2), (1, 0), (2, 0), (2, 1), (4, 0), (4, 3), (1, 3)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, max_iterations=50, tol=1e-12).collect()
    }

    n, d = 5, 0.85
    M = np.zeros((n, n))
    deg = {u: sum(1 for a, _ in E if a == u) for u in range(n)}
    for u, v in E:
        M[v, u] = 1.0 / deg[u]
    r = np.full(n, 1.0 / n)
    for _ in range(200):
        dangling = sum(r[u] for u in range(n) if deg[u] == 0)
        r = (1 - d) / n + d * (M @ r + dangling / n)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for u in range(n):
        assert abs(got[u] - r[u]) < 1e-6, (u, got[u], r[u])
    # The hub outranks the dangling sink's parents.
    assert got[0] == max(got.values())


def test_pagerank_uniform_on_cycle(spark):
    from legendary_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    got = [r["rank"] for r in pagerank(edges, max_iterations=30).collect()]
    assert all(abs(x - 1 / 6) < 1e-9 for x in got)


def test_best_member_keeps_longest_with_tiebreak(spark):
    from legendary_data_pipeline_spark.operators.graph import (
        best_member,
        connected_components,
    )
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    attrs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)], "doc_id long, n_chars long"
    )
    comps = connected_components(edges)
    best = {
        r["component"]: (r["node"], r["n_chars"], r["n_members"])
        for r in best_member(
            comps, attrs, [F.col("n_chars").desc(), F.col("node").asc()]
        ).collect()
    }
    # component 1 = {1,2,3}: longest is 9 chars, tie between 2 and 3 -> min id 2
    assert best[1] == (2, 9, 3)
    # component 10 = {10,11}: tie at 4 chars -> min id 10
    assert best[10] == (10, 4, 2)


def test_near_dup_components_releases_shingle_cache(spark):
    """The fused shingle cache must be unpersisted once verified pairs
    materialize — long-lived sessions (curate CLI) call this per run
    and would otherwise leak one cached frame per invocation."""
    from legendary_data_pipeline_spark.operators.graph import (
        near_dup_components,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely unrelated text about spark execution plans"),
        ],
        "doc_id long, text string",
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    out = near_dup_components(docs, min_jaccard=0.3)
    rows = out.collect()
    # docs 1 and 2 are near-dups of each other; 3 is a singleton (absent).
    assert {r["node"] for r in rows} == {1, 2}
    assert len({r["component"] for r in rows}) == 1
    assert cm.isEmpty()


def test_triangle_count_known_graphs(spark):
    from legendary_data_pipeline_spark.operators.graph import triangle_count

    # K4 has C(4,3) = 4 triangles and 6 edges.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = triangle_count(_edges(spark, k4)).first()
    assert r["n_edges"] == 6 and r["n_triangles"] == 4
    # A chain has none.
    r = triangle_count(_edges(spark, [(1, 2), (2, 3), (3, 4)])).first()
    assert r["n_edges"] == 3 and r["n_triangles"] == 0
    # Duplicates / reversed orientations / self-loops canonicalize away.
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)]
    r = triangle_count(_edges(spark, messy)).first()
    assert r["n_edges"] == 3 and r["n_triangles"] == 1


def test_local_and_distributed_components_agree(spark):
    from legendary_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (30, 30)],
        "id_a long, id_b long",
    )
    local = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(edges, local_threshold=0).collect()
    }
    assert local == dist
    # min-label semantics: the 20-21-22 triangle labels as 20
    assert (22, 20) in local


def test_local_components_string_ids(spark):
    from legendary_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string"
    )
    out = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert out == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    }


def test_clustering_coefficients_known_graph(spark):
    from legendary_data_pipeline_spark.operators.graph import (
        clustering_coefficients,
    )

    # triangle 1-2-3 plus pendant 3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    out = {r["node"]: r for r in clustering_coefficients(edges).collect()}
    assert out[1]["coeff"] == 1.0 and out[1]["triangles"] == 1
    assert out[2]["coeff"] == 1.0
    # node 3: degree 3, one triangle -> 2*1/(3*2) = 1/3
    assert out[3]["degree"] == 3
    assert abs(out[3]["coeff"] - 1 / 3) < 1e-6
    # pendant: degree 1 -> undefined
    assert out[4]["coeff"] is None and out[4]["triangles"] == 0


def test_clustering_coefficients_clique(spark):
    from itertools import combinations

    from legendary_data_pipeline_spark.operators.graph import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        list(combinations(range(5), 2)), "id_a long, id_b long"
    )
    out = clustering_coefficients(edges).collect()
    assert all(r["coeff"] == 1.0 for r in out)
    assert all(r["triangles"] == 6 for r in out)  # C(4,2) per node in K5


def test_triangle_count_degree_orientation_equivalent(spark):
    from legendary_data_pipeline_spark.operators.graph import triangle_count

    # K8 (C(8,3)=56 triangles) + deterministic pseudo-random extra edges
    rows = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    rows += [((i * 37) % 50, (i * 61) % 50) for i in range(400)]
    edges = spark.createDataFrame(rows, "id_a long, id_b long")
    by_id = triangle_count(edges).collect()[0]
    by_deg = triangle_count(edges, orient="degree").collect()[0]
    assert by_id["n_triangles"] == by_deg["n_triangles"] >= 56
    assert by_id["n_edges"] == by_deg["n_edges"]

    # hub-and-spoke + one rim edge: exactly 1 triangle under both
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 30)] + [(1, 2)], "id_a long, id_b long"
    )
    assert triangle_count(star).collect()[0]["n_triangles"] == 1
    assert (
        triangle_count(star, orient="degree").collect()[0]["n_triangles"] == 1
    )


def test_triangle_count_orient_validation(spark):
    import pytest as _pytest

    from legendary_data_pipeline_spark.operators.graph import triangle_count

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError, match="orient"):
        triangle_count(edges, orient="random")


def test_triangle_count_methods_agree(spark):
    from legendary_data_pipeline_spark.operators.graph import triangle_count

    rows = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    rows += [((i * 37) % 50, (i * 61) % 50) for i in range(400)]
    edges = spark.createDataFrame(rows, "id_a long, id_b long")
    base = triangle_count(edges).collect()[0]
    for orient in ("id", "degree"):
        r = triangle_count(edges, orient=orient, method="adjacency").collect()[0]
        assert (r["n_edges"], r["n_triangles"]) == (
            base["n_edges"], base["n_triangles"],
        )
    # empty graph: 0 / 0 under the adjacency path too (coalesce guard)
    from pyspark.sql import functions as F

    empty = edges.filter(F.lit(False))
    r = triangle_count(empty, method="adjacency").collect()[0]
    assert (r["n_edges"], r["n_triangles"]) == (0, 0)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        triangle_count(edges, method="wedge")


def test_pagerank_fixed_int_local_and_distributed_agree(spark):
    """The driver-local fallback (local_threshold) must emit values
    BIT-IDENTICAL to the distributed loop — same integer recurrence,
    Python // == Spark div on nonnegative ints. Mirrors
    test_local_and_distributed_components_agree."""
    from legendary_data_pipeline_spark.operators.graph import (
        pagerank_fixed_int,
    )

    # node 6 is SINK-ONLY (in-links, no out-links) so the dangling-mass
    # term — the path this round rewrote twice (in-plan broadcast +
    # local Python) — is nonzero every iteration, not vacuously 0;
    # a NULL-endpoint edge pins the shared isNotNull drop on both legs
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 0), (0, 4), (5, 0),
         (0, 6), (None, 3), (3, None)],
        "src long, dst long",
    )
    local = {
        r.node: r.rank_e12
        for r in pagerank_fixed_int(edges, iterations=7).collect()
    }
    dist = {
        r.node: r.rank_e12
        for r in pagerank_fixed_int(
            edges, iterations=7, local_threshold=0
        ).collect()
    }
    assert local == dist
    assert None not in local  # NULL endpoints dropped, not a node
    # node 0 (most in-links) must outrank the dangling-free tail
    assert local[0] == max(local.values())
