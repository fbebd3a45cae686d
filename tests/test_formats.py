"""Source/sink format breadth: JSON-lines, ORC, and CSV roundtrips preserve
schema and values (SURVEY §2.1 S-row extensions)."""

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table


def _orders(spark):
    return read_table(spark, SF_SMALL, "orders").orderBy("o_orderkey").limit(200)


def test_json_lines_roundtrip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_json")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert back.count() == 200
    a = {r.o_orderkey: r.o_totalprice for r in src.collect()}
    b = {r.o_orderkey: r.o_totalprice for r in back.collect()}
    assert a == b


def test_orc_roundtrip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.count() == 200
    # pushdown works on ORC scans too
    plan = (
        back.filter(F.col("o_orderkey") == 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan


def test_csv_roundtrip_with_typed_read(spark, tmp_path):
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources.csv import (
        read_csv_typed,
    )

    src = _orders(spark).select("o_orderkey", "o_custkey", "o_totalprice")
    path = str(tmp_path / "orders_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = read_csv_typed(
        spark, path, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    assert back.count() == 200
    a = {r.o_orderkey: r.o_totalprice for r in src.collect()}
    b = {r.o_orderkey: r.o_totalprice for r in back.collect()}
    assert a == b
