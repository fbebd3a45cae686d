"""Parquet star-schema sources (the driver-generated TPC-H-ish testdata).

Scans are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning / partition pruning on the file source — at 100 TB
these tables would be directory-partitioned and the same code path prunes
partitions for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: The relational star only (no extension tables).
STAR_TABLES = TABLES[:7]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    default. Read nanos as long (runtime conf) and normalize to a proper
    TimestampType column via exact integer division — ns epoch values
    (~1.7e18) exceed double's 2^53 mantissa, so ``ts / 1000`` in floating
    point would drift by hundreds of ns."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # queries over events export epoch seconds (window starts, session
    # bounds); epoch extraction from a naive-storage timestamp depends on
    # the session timezone, so pin UTC to match the SQL oracle regardless
    # of the caller's session default. (Wall-clock functions like year()
    # are timezone-independent for naive data, so this is a no-op for the
    # relational tables.)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (the reference's catalog idiom,
    ``/root/reference/src/quality_checks.py:125``) and return the frames."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
