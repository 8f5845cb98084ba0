"""Scale evidence: bucketed tables join without a shuffle exchange."""

from __future__ import annotations

import re


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/bkt.db'"
    )
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force a non-broadcast join so the bucketed co-location is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(0, 10_000).selectExpr(
            "id AS o_orderkey", "id % 97 AS o_custkey"
        )
        lines = spark.range(0, 30_000).selectExpr(
            "id % 10000 AS l_orderkey", "id AS l_id", "id * 2 AS l_qty"
        )
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bkt.orders_b")
        )
        (
            lines.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("bkt.lines_b")
        )
        ob = spark.table("bkt.orders_b")
        lb = spark.table("bkt.lines_b")
        joined = ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: SortMergeJoin with NO shuffle exchange
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        assert joined.count() == 30_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")
