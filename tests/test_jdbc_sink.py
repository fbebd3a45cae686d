"""JDBC sink gating: no driver jar ships in this container, so the parallel
JDBC path cannot write for real. This test proves the wiring is correct up
to the classpath boundary — the configured driver class (and only it) is
what Spark fails to find — and documents the gate executably."""

from __future__ import annotations

import pytest

from walmart_retail_pyspark_sqlite_pipeline_spark.sinks.jdbc import write_jdbc


def test_write_jdbc_fails_only_on_missing_driver_jar(spark, tmp_path):
    df = spark.range(3).withColumnRenamed("id", "v")
    with pytest.raises(Exception) as exc:
        write_jdbc(
            df,
            url=f"jdbc:sqlite:{tmp_path}/gate.db",
            table="t",
            driver="org.sqlite.JDBC",
            num_partitions=1,
        )
    # the failure must be the missing jar, not our option plumbing
    assert "org.sqlite.JDBC" in str(exc.value)
    assert "ClassNotFoundException" in str(exc.value)
