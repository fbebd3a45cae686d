"""The oracle gate's own guards: the decimal tripwire must reject the
q20-class one-sided/mismatched decimal drift while letting deliberately
decimal-typed queries (q39) through."""

from __future__ import annotations

import duckdb

from tools.oracle_check import compare


def test_one_sided_decimal_trips(spark):
    con = duckdb.connect()
    df = spark.sql("SELECT CAST(1 AS BIGINT) AS x")
    ok, problems = compare("t", df, con, "SELECT CAST(1.0 AS DECIMAL(38,0)) AS x")
    assert not ok and any("decimal" in p for p in problems)


def test_mismatched_decimal_scale_trips(spark):
    con = duckdb.connect()
    df = spark.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS x")
    ok, problems = compare("t", df, con, "SELECT CAST(1.5 AS DECIMAL(18,3)) AS x")
    assert not ok and any("decimal" in p for p in problems)


def test_matched_decimal_passes_exact(spark):
    con = duckdb.connect()
    df = spark.sql("SELECT CAST(1.50 AS DECIMAL(18,2)) AS x")
    ok, problems = compare("t", df, con, "SELECT CAST(1.50 AS DECIMAL(18,2)) AS x")
    assert ok, problems


def test_matched_decimal_value_diff_still_fails(spark):
    con = duckdb.connect()
    df = spark.sql("SELECT CAST(1.50 AS DECIMAL(18,2)) AS x")
    ok, _ = compare("t", df, con, "SELECT CAST(1.51 AS DECIMAL(18,2)) AS x")
    assert not ok
