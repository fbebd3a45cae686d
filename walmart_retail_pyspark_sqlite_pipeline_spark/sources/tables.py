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


#: DuckDB twin of the :func:`read_embeddings` ingestion contract. Every
#: embedding oracle embeds EXACTLY the subquery
#: ``(SELECT * FROM embeddings WHERE {EMB_VALID_SQL}) embeddings`` —
#: tests/test_registry.py asserts each site matches this constant, so a
#: contract change is one edit here + one mechanical sync of the oracle
#: strings instead of 19 opportunities for silent engine drift.
EMB_VALID_SQL = (
    "embedding IS NOT NULL"
    " AND len(list_filter(embedding, x -> x IS NULL)) = 0"
    " AND len(list_filter(embedding, x -> x <> 0)) > 0"
)


def read_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings SOURCE contract: every yielded vector is non-NULL,
    has no NULL element, and has at least one nonzero component. A real
    vector store enforces exactly this at ingestion (a NULL row is a
    failed embed job; an all-zero vector has no direction, so every
    cosine-metric op — the table's primary consumers — is undefined on
    it), and quarantining here once keeps all ~20 downstream ANN/dedup/
    clustering queries and their DuckDB twins on one shared semantics
    instead of 20 per-query guards. The pushdown-friendly IS NOT NULL
    lands in the scan; the element predicates run post-scan. Edge rows
    exercised by tools/make_edge_sf.py.

    Deliberately a SEPARATE entry point rather than a branch inside
    :func:`read_table`: the re-grade-on-rewrite hash covers the
    transitive closure of helpers, and read_table is in EVERY query's
    closure — a branch there would have spuriously drifted ~120
    parked queries that never touch embeddings.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return df.filter(
        F.col("embedding").isNotNull()
        & ~F.exists("embedding", lambda x: x.isNull())
        & F.exists("embedding", lambda x: x != 0)
    )


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain ``TimestampType`` regardless
    of how the parquet writer encoded it:

    - TIMESTAMP(NANOS) read as long via ``spark.sql.legacy.parquet.
      nanosAsLong`` → exact integer ``div 1000`` to micros (ns epoch values
      ~1.7e18 exceed double's 2^53 mantissa, so float division would drift);
    - ``timestamp[us]`` with isAdjustedToUTC=false, which Spark 4 infers as
      TIMESTAMP_NTZ → cast to TimestampType. Callers pin the session
      timezone to UTC first, so the cast is epoch-preserving and the
      downstream ``cast(ts AS long)`` epoch-seconds idiom (which is illegal
      on NTZ) matches DuckDB's ``epoch(ts)`` on the same naive storage.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # queries over events export epoch seconds (window starts, session
    # bounds); epoch extraction from a naive-storage timestamp depends on
    # the session timezone, so pin UTC to match the SQL oracle regardless
    # of the caller's session default. (Wall-clock functions like year()
    # are timezone-independent for naive data, so this is a no-op for the
    # relational tables.)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return normalize_event_ts(df)


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
