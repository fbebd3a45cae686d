"""Two-stream as-of join and binned range join: boundary semantics and the
no-nested-loop plan guarantee."""

from pyspark.sql import Row

from walmart_retail_pyspark_sqlite_pipeline_spark.operators import binned_range_join
from walmart_retail_pyspark_sqlite_pipeline_spark.streaming.events import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(user_id=1, ts_s=10, event_id=100),  # tie: right at 10 matches
            Row(user_id=1, ts_s=4, event_id=101),   # before any right -> NULL
            Row(user_id=1, ts_s=99, event_id=102),  # latest right wins (15)
            Row(user_id=2, ts_s=50, event_id=103),  # other key isolated -> NULL
        ]
    )
    right = spark.createDataFrame(
        [Row(user_id=1, ts_s=5), Row(user_id=1, ts_s=10), Row(user_id=1, ts_s=15)]
    )
    got = {
        r.event_id: r.asof_ts
        for r in asof_join(left, right, key="user_id", ts_col="ts_s").collect()
    }
    assert got == {100: 10, 101: None, 102: 15, 103: None}


def test_binned_range_join_boundaries(spark):
    """Both interval ends are inclusive, and points in a different bucket
    than the interval bounds still match when inside the range."""
    intervals = spark.createDataFrame([Row(iv_id=1, lo=100, hi=200)])
    points = spark.createDataFrame(
        [Row(p=99), Row(p=100), Row(p=150), Row(p=200), Row(p=201)]
    )
    got = sorted(
        r.p
        for r in binned_range_join(intervals, points, "p", "lo", "hi", 7).collect()
    )
    assert got == [100, 150, 200]


def test_binned_range_join_rejects_name_collision(spark):
    import pytest

    df = spark.createDataFrame([Row(x=1, lo=0, hi=1)])
    with pytest.raises(ValueError):
        binned_range_join(df, df, "x", "lo", "hi", 10)


def test_binned_range_join_plan_has_no_nested_loop(spark):
    """The whole point of binning: the physical plan must be an equi hash/
    sort-merge join on the bucket id, never BroadcastNestedLoopJoin or
    CartesianProduct."""
    intervals = spark.range(100).selectExpr(
        "id AS iv_id", "id * 10 AS lo", "id * 10 + 30 AS hi"
    )
    points = spark.range(1000).selectExpr("id AS p")
    plan = binned_range_join(
        intervals, points, "p", "lo", "hi", 32
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
