"""Data-layout operator tests: bucketed co-located joins (the write-once,
join-shuffle-free layout; Z-order layout tests live in test_sketches.py /
test_scale_patterns.py)."""

from __future__ import annotations

def test_bucketed_join_plans_without_exchange(spark, tmp_path):
    """Both sides written bucketed by the join key -> the equi-join on that
    key must plan with ZERO Exchange (the whole point of the layout: the
    shuffle is paid once at write time, not per query)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.operators.layout import (
        bucketed_tables,
    )

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table

    orders = read_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = read_table(spark, SF_SMALL, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    lname, rname = bucketed_tables(
        spark, orders, lineitem, "o_orderkey", n_buckets=4, prefix="bkt_t1"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the big-big join shape (broadcast would mask the layout win
        # this test exists to prove)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(lname).join(spark.table(rname), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is the plain join's result
        expect = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {lname}")
        spark.sql(f"DROP TABLE IF EXISTS {rname}")
