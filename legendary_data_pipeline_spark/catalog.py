"""Warehouse catalog: loaders for the driver-generated parquet tables.

Models the reference's PostgreSQL table catalog (SURVEY.md §1.4) as
parquet-backed DataFrames. At 100 TB each of these would be a
date-partitioned parquet/Delta table; the loaders keep scans lazy so
Catalyst performs column pruning + predicate pushdown into the parquet
reader — never pre-materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions a planner should always broadcast in joins.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one warehouse table lazily from `sf_dir`.

    `events.ts` is nanosecond-precision parquet; Spark loads it as integer
    nanos (via nanosAsLong) and downstream event-time logic uses integer
    arithmetic (`ts DIV 86400000000000` for days, `ts DIV 1000` for
    micros — see the event queries), which is exact and portable.
    """
    if name == "events":
        # Runtime-settable; required for TIMESTAMP(NANOS) parquet columns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def load_distributed(
    spark: SparkSession, sf_dir: str, name: str, partitions: int | None = None
) -> DataFrame:
    """Load + round-robin repartition to the session's parallelism.

    Small single-file parquet inputs (the local testdata) arrive as ONE
    scan partition, serializing any expensive per-row compute. A real
    100 TB table already has thousands of scan splits — use plain
    `load_table` there; this helper is for compute-heavy operators over
    inputs whose file layout under-splits.
    """
    df = load_table(spark, sf_dir, name)
    n = partitions or spark.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql(...) plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
