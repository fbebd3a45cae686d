from pyspark.sql import Row

from walmart_retail_pyspark_sqlite_pipeline_spark.operators import (
    enforce_schema,
    rename_columns,
)


def test_rename_drops_unmapped_and_null_pads(spark):
    df = spark.createDataFrame([Row(a=1, b="x", junk="drop-me")])
    out = rename_columns(df, {"a": "alpha", "b": "beta", "missing": "gamma"})
    assert out.columns == ["alpha", "beta", "gamma"]
    row = out.collect()[0]
    assert row.alpha == 1 and row.beta == "x" and row.gamma is None
    assert dict(out.dtypes)["gamma"] == "string"


def test_enforce_schema_casts_adds_reorders_and_reports_extras(spark):
    df = spark.createDataFrame(
        [Row(Store="7", Weekly_Sales="123.45", Extra="x")]
    )
    out, extras = enforce_schema(
        df, {"Store": "int", "Dept": "int", "Weekly_Sales": "double"}
    )
    assert extras == ["Extra"]
    assert out.columns == ["Store", "Dept", "Weekly_Sales"]
    row = out.collect()[0]
    assert row.Store == 7 and row.Dept is None and row.Weekly_Sales == 123.45


def test_enforce_schema_na_becomes_null_even_under_ansi(spark):
    # the reference's missing-data mechanism: "NA" -> NULL via lenient cast
    df = spark.createDataFrame([Row(MarkDown2="NA"), Row(MarkDown2="12.5")])
    out, _ = enforce_schema(df, {"MarkDown2": "double"})
    vals = sorted(
        [r.MarkDown2 for r in out.collect()], key=lambda v: (v is None, v)
    )
    assert vals == [12.5, None]


def test_enforce_schema_bool_and_empty_string(spark):
    df = spark.createDataFrame(
        [Row(IsHoliday="TRUE"), Row(IsHoliday="FALSE"), Row(IsHoliday="")]
    )
    out, _ = enforce_schema(df, {"IsHoliday": "boolean"})
    vals = [r.IsHoliday for r in out.collect()]
    assert sorted(v for v in vals if v is not None) == [False, True]
    assert vals.count(None) == 1
