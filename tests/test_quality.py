from pyspark.sql import Row
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from walmart_retail_pyspark_sqlite_pipeline_spark.quality import (
    count_duplicates,
    profile,
    run_quality_checks,
)


def test_profile_single_pass(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=None, b=""),
            Row(a=3, b=None),
            Row(a=1, b="x"),
        ]
    )
    n, fractions, dup = profile(df)
    assert n == 4
    assert fractions["a"] == 0.25
    assert fractions["b"] == 0.5  # null OR empty string
    assert dup == 1  # the (1, "x") repeat


def test_profile_counts_null_rows_as_duplicates(spark):
    # countDistinct(struct(...)) must count all-null rows like distinct()
    df = spark.createDataFrame(
        [Row(a=None, b=None), Row(a=None, b=None), Row(a=1, b="y")]
    )
    n, _, dup = profile(df)
    assert n == 3 and dup == 1


def test_profile_empty_input(spark):
    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", StringType())]
    )
    df = spark.createDataFrame([], schema)
    n, fractions, dup = profile(df)
    assert n == 0 and dup == 0
    assert fractions == {"a": 0.0, "b": 0.0}


def test_count_duplicates_subset(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="b"), Row(k=2, v="c")]
    )
    assert count_duplicates(df, ["k"]) == 1
    assert count_duplicates(df) == 0


def test_fail_on_schema_mismatch_flags_extras(spark):
    df = spark.createDataFrame([Row(Store="1", Rogue="x")])
    _, report = run_quality_checks(
        df,
        {"Store": "int"},
        "strict",
        fail_on_schema_mismatch=True,
        register_view=False,
    )
    assert report.schema_ok is False
    assert any("Rogue" in i for i in report.issues)
    # lenient mode: same extras, but schema_ok stays True (reference default,
    # fail_on_schema_mismatch: false)
    _, lenient = run_quality_checks(
        df, {"Store": "int"}, "lenient", register_view=False
    )
    assert lenient.schema_ok is True


def test_run_quality_checks_end_to_end(spark):
    df = spark.createDataFrame(
        [
            Row(Store="1", Weekly_Sales="10.0", MarkDown2="NA"),
            Row(Store="1", Weekly_Sales="10.0", MarkDown2="NA"),
            Row(Store="2", Weekly_Sales="20.0", MarkDown2="NA"),
            Row(Store="3", Weekly_Sales="30.0", MarkDown2="5.0"),
        ]
    )
    typed, report = run_quality_checks(
        df,
        {"Store": "int", "Weekly_Sales": "double", "MarkDown2": "double"},
        "unit",
        max_null_fraction=0.6,
    )
    assert report.duplicate_count == 1
    assert report.row_count == 3  # post-dedup
    assert typed.count() == 3
    assert report.null_fractions["MarkDown2"] == 0.75
    assert any("MarkDown2" in i for i in report.issues)
    assert spark.table("typed_unit").count() == 3
