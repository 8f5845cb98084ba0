"""JDBC source for the live-database path (SURVEY.md §2.1 S3).

The reference reads its tables straight from PostgreSQL; the engine's
testdata path reads parquet, but production parity needs partitioned
JDBC scans. `jdbc_options` is a pure option builder (unit-testable);
`read_jdbc_table` applies it.

Scale notes:
- ALWAYS pass a `partition_column` + bounds for big tables: without
  them the whole table arrives through ONE connection/task.
- `num_partitions` also caps concurrent connections — align it with
  the source DB's capacity (the reference pooled at max 5,
  03_build_market_price_daily.js:65-68).
- Push filters into `table` as a subquery (`(SELECT ... WHERE ...) t`)
  when the driver-side predicate would pull too much; Spark also pushes
  simple filters itself (JDBC predicate pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 4,
    fetch_size: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    """Build the option map for a (possibly partitioned) JDBC scan."""
    opts = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        "fetchsize": str(fetch_size),
    }
    bounded = (
        partition_column is not None
        and lower_bound is not None
        and upper_bound is not None
    )
    if bounded:
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    elif partition_column is not None:
        raise ValueError(
            "partition_column requires lower_bound and upper_bound "
            "(Spark needs the stride to split the scan)"
        )
    return opts


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    **kwargs,
) -> DataFrame:
    """Partitioned JDBC scan; see `jdbc_options` for kwargs."""
    reader = spark.read.format("jdbc")
    for key, value in jdbc_options(url, table, **kwargs).items():
        reader = reader.option(key, value)
    return reader.load()
