"""Scale evidence: date filters prune partitions on partitioned tables."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.plans import jobs


def test_daily_build_prunes_date_partitions(spark, tmp_path):
    path = str(tmp_path / "snaps")
    snaps = spark.createDataFrame(
        [
            (1, "tcgplayer", "2024-06-01", "USD", "market", None, 100, "{}"),
            (1, "tcgplayer", "2024-06-02", "USD", "market", None, 150, "{}"),
            (1, "tcgplayer", "2024-06-03", "USD", "market", None, 175, "{}"),
        ],
        "market_item_id long, source string, as_of_date string, currency string,"
        " price_type string, condition string, value_cents long, raw string",
    ).withColumn("as_of_date", F.col("as_of_date").cast("date"))
    snaps.write.partitionBy("as_of_date").parquet(path)

    part = spark.read.parquet(path)
    out = jobs.build_market_price_daily(part, date="2024-06-02")
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "as_of_date" in m.group(1), plan
    # the filter reached the scan: only the one touched date is read
    assert [r.value_cents for r in out.collect()] == [150]
    files = re.search(r"partition\w* read|PartitionCount[^,\n]*", plan)
    # PartitionCount appears in the scan metadata when pruning applied
    assert "PartitionCount: 1" in plan or files is None
