"""Distributed connected components (dedup clustering).

Near-duplicate PAIRS are only half the dedup story: to keep exactly one
canonical document per duplicate group, pairs must be closed into
components (a ~ b, b ~ c ⇒ {a,b,c} is one group even if a ~ c was never
emitted). This module turns an edge list into a (node, component)
mapping with component = min reachable node id — deterministic and
order-free.

Algorithm: iterative min-label propagation. Each round every node takes
the minimum label among itself and its neighbors; convergence when no
label changes. Rounds needed = graph diameter. For near-dup graphs this
is small (duplicate groups are near-cliques: LSH emits most intra-group
pairs, so diameters are 1-3), which makes plain propagation the right
trade against the more complex O(log n)-round large-star/small-star
scheme — each round here is ONE shuffle join + ONE aggregation.

Scale notes (100 TB):
- State per round is (node, label) pairs — two longs per node appearing
  in any edge, NOT the corpus.
- Lineage is truncated every round (`localCheckpoint`); without it the
  iterated join plan grows exponentially and the driver dies at plan
  optimization long before data volume matters. On a cluster prefer
  `checkpoint()` with a checkpoint dir for fault tolerance.
- The convergence check is one count() action per round on the changed
  set — metadata-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node in `edges`; component is the
    minimum node id reachable through the undirected edge set.

    Raises RuntimeError if not converged within `max_iterations` (the
    bound is a safety rail — diameter-many rounds are needed, and a
    duplicate-cluster graph's diameter is small).
    """
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("__nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                "component",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nmin"), F.col("component"))
                ).alias("__new"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("__new") < F.col("component")).count()
        # One checkpoint per round is enough: `labels` is a depth-one
        # projection of the already-checkpointed `updated` frame.
        labels = updated.select("node", F.col("__new").alias("component"))
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def canonical_members(components: DataFrame) -> DataFrame:
    """Per-component summary: size and canonical (min-id) member —
    `component` IS the canonical id by construction, kept explicit for
    readability downstream."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("canonical_id"),
    )
