"""Count-Min sketch: the mergeable point-FREQUENCY sketch.

Completes the engine's sketch algebra (HLL = distinct counts, Theta =
set operations, KLL = quantiles — SCALE.md sketch-algebra table) with
the classic Cormode-Muthukrishnan structure for "how often does key X
occur" questions over streams/partitions that cannot be rescanned.

Unlike library sketches, this one is built on the engine's portable
md5 affine hash family (functions/hashing.py), which makes every
estimate BIT-DETERMINISTIC and replayable in DuckDB — the driver's
oracle can hash-compare estimates, not just bound them. The classic
guarantees still hold: estimates never undercount, and with width w
and depth d, P[est > true + 2N/w] < (1/2)^d.

Representation: a (row_idx, col_idx, cnt) cell frame — at most
depth × width rows regardless of data size. Cells MERGE by summing
(map-side combinable, union-and-regroup across batches/partitions),
which is what makes this the anti-rescan primitive: per-day sketches
roll up to any window without touching raw events again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.functions.hashing import (
    affine31,
    affine31_sql,
    base31,
    base31_sql,
    hash_family_params,
)

__all__ = [
    "cms_build",
    "cms_merge",
    "cms_query",
    "cms_inner_product",
    "cms_sql_parts",
]

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1024


def _cols_for(key: Column, depth: int, width: int) -> list[Column]:
    base = base31(key)
    return [
        affine31(base, a, b) % width for a, b in hash_family_params(depth)
    ]


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch the frequency of ``key_col`` (cast to string, one md5 per
    row) into (row_idx, col_idx, cnt) cells.

    One scan: each row explodes into ``depth`` (row, col) updates — a
    constant fan-out — then a cell-keyed aggregation with map-side
    combine reduces to ≤ depth × width rows. This per-row form never
    shuffles the data (cells combine map-side), which is the right
    default for raw streams at scale.

    ``weight_col``: build from an ALREADY-AGGREGATED (key, count)
    frame instead — each key's cells are credited ``weight_col``
    occurrences. Bit-identical to the per-row build over the
    un-aggregated data (cell counts are sums of exact integers), but
    hashes each distinct key once. Use it when a per-key aggregate
    already exists in the pipeline; do NOT introduce a key shuffle
    just to use it (for high-cardinality keys that shuffle is
    data-sized, while the per-row build's cell combine is not).
    """
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"), c.alias("col_idx")
            )
            for i, c in enumerate(_cols_for(key, depth, width))
        ]
    )
    if weight_col is None:
        return (
            df.select(F.explode(cells).alias("__c"))
            .select("__c.row_idx", "__c.col_idx")
            .groupBy("row_idx", "col_idx")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
    return (
        df.select(F.explode(cells).alias("__c"), F.col(weight_col).alias("__w"))
        .select("__c.row_idx", "__c.col_idx", "__w")
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge cell frames built with identical (depth, width): cells add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "col_idx").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for every probe key.

    est = min over the depth rows of the addressed cell counts (absent
    cell → 0). The sketch side is ≤ depth × width rows — broadcast —
    so probing any number of keys is a map-side join, no shuffle of
    the probe stream.
    """
    key = F.col(key_col).cast("string")
    addr = F.array(
        *[
            F.struct(F.lit(i).alias("row_idx"), c.alias("col_idx"))
            for i, c in enumerate(_cols_for(key, depth, width))
        ]
    )
    probed = probes.select(
        *probes.columns, F.explode(addr).alias("__a")
    ).select(*probes.columns, "__a.row_idx", "__a.col_idx")
    joined = probed.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join SIZE estimate from two sketches (same depth/width):

        est = min over rows i of  Σ_col  a[i][col] · b[i][col]

    — the Cormode-Muthukrishnan inner-product estimator. Never
    undercounts the true join cardinality Σ_k f_a(k)·f_b(k), with
    P[est > true + 2·N_a·N_b/w] < (1/2)^d. Both operands are
    ≤ depth × width rows, so the whole estimate is a metadata-scale
    join — the cost-based "how big would this join be?" probe that
    avoids running (or even scanning) the join itself.

    Output: one row (cms_est).
    """
    dots = a.join(
        b.select(
            F.col("row_idx"),
            F.col("col_idx"),
            F.col("cnt").alias("__cnt_b"),
        ),
        ["row_idx", "col_idx"],
    ).groupBy("row_idx").agg(
        F.sum(F.col("cnt") * F.col("__cnt_b")).cast("long").alias("__dot")
    )
    # a hash row with NO overlapping cells has dot 0 — it must still
    # participate in the min (est is then 0), so seed every row of `a`.
    rows = a.select("row_idx").distinct()
    prod = rows.join(dots, "row_idx", "left").select(
        F.coalesce(F.col("__dot"), F.lit(0)).alias("__dot")
    )
    return prod.agg(
        F.coalesce(F.min("__dot"), F.lit(0)).cast("long").alias("cms_est")
    )


def cms_sql_parts(
    key_expr: str, depth: int = DEFAULT_DEPTH, width: int = DEFAULT_WIDTH
) -> list[str]:
    """DuckDB column expressions for the ``depth`` cell addresses of
    ``key_expr`` — the oracle-side mirror of :func:`_cols_for`."""
    base = base31_sql(key_expr)
    return [
        f"({affine31_sql(base, a, b)} % {width})"
        for a, b in hash_family_params(depth)
    ]
