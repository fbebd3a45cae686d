"""Incremental materialized-rollup maintenance: keep an hourly aggregate
table current under appends without recomputing history.

This is the batch twin of the streaming hourly rollup
(streaming/events.py): Structured Streaming maintains the same aggregate
with watermarked state, while this operator maintains it as a parquet
table with *delta aggregation + partition-pruned merge* — the pattern for
a 100 TB fact where history is immutable and each ingest touches a few
recent partitions. Work per refresh is O(new batch + touched partitions),
never O(table).

Aggregates carry integer cents (exact, associative) so merging partials
is drift-free — the same discipline the oracle queries use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ["d", "hour_s", "event_type"]


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Per (day, hour, event_type): event count and value cents.

    One shuffle on the grouping key; `d` duplicates the date part of
    `hour_s` purely as the partition column, so every downstream merge
    prunes by directory."""
    return (
        events.select(
            F.to_date("ts").alias("d"),
            F.expr("CAST(date_trunc('hour', ts) AS LONG)").alias("hour_s"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy(*ROLLUP_KEYS)
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("cents"))
    )


def build_rollup(spark: SparkSession, events: DataFrame, path: str) -> None:
    """Initial materialization, hive-partitioned by day."""
    hourly_rollup(events).write.partitionBy("d").parquet(path)


def incremental_rollup_merge(
    spark: SparkSession, path: str, new_events: DataFrame
) -> dict:
    """Fold a batch of new events into the stored rollup.

    1. Aggregate ONLY the batch (count/cents are associative partials).
    2. Read back just the day-partitions the batch touches (directory
       pruning — the table's history is never scanned).
    3. Full-outer merge on the rollup key, adding partials where both
       sides have a row.
    4. Dynamic partition overwrite rewrites exactly the touched days.

    The merged slice is eagerly materialized first because the write
    replaces files the lazy plan would re-read.
    """
    delta = hourly_rollup(new_events)
    touched = [r[0] for r in delta.select("d").distinct().collect()]
    base = spark.read.parquet(path).filter(F.col("d").isin(touched))
    merged = (
        base.select(
            *ROLLUP_KEYS,
            F.col("n_events").alias("bn"),
            F.col("cents").alias("bc"),
        )
        .join(
            delta.select(
                *ROLLUP_KEYS,
                F.col("n_events").alias("dn"),
                F.col("cents").alias("dc"),
            ),
            ROLLUP_KEYS,
            "full_outer",
        )
        .select(
            *ROLLUP_KEYS,
            (
                F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0))
            ).alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("d").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"touched_days": sorted(str(t) for t in touched)}


def rollup_stream_sink(events_stream, path: str, checkpoint_dir: str):
    """Maintain the rollup from a stream: each micro-batch folds in via
    ``incremental_rollup_merge`` under ``foreachBatch``.

    Structured Streaming's contract is at-least-once invocation of
    foreachBatch (a batch can be REPLAYED after a crash between sink commit
    and checkpoint commit), so the sink keeps its own batch-id ledger next
    to the table and skips ids it has already applied — ledger + additive
    merge together give end-to-end exactly-once, the same trick a
    transactional table format plays with its commit log.
    """
    import os

    # sibling dir, not inside `path`: the initial build_rollup write must
    # see a non-existent table directory
    ledger = path.rstrip("/") + "_ledger"

    def fold(batch_df, batch_id: int) -> None:
        os.makedirs(ledger, exist_ok=True)
        mark = os.path.join(ledger, f"batch-{batch_id}")
        if os.path.exists(mark):  # replayed batch: already applied, skip
            return
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            incremental_rollup_merge(spark, path, batch_df)
        else:
            build_rollup(spark, batch_df, path)
        with open(mark, "w") as f:
            f.write("applied")

    return (
        events_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
