"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-user counters (events seen, value accumulated) maintained as
GroupState across micro-batches — the Structured Streaming primitive for
operators that windowed aggregation cannot express (per-key custom state
machines, CEP-ish logic, incremental sketches).

Scale shape: state lives in the executor state store partitioned by the
group key; each micro-batch shuffles only that batch's rows to their key's
partition. State size is bounded by a timeout policy in production
(``GroupStateTimeout.ProcessingTimeTimeout``) — kept NoTimeout here because
the availableNow demo terminates.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals_stream(
    spark: SparkSession, events_path: str
) -> DataFrame:
    """Run the stateful counter over the events parquet with availableNow;
    returns the final per-user totals from the memory sink (update mode →
    last emitted row per user is the final state)."""
    import itertools
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
        .select("user_id", "value")
    )
    result = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if not hasattr(running_user_totals_stream, "_counter"):
        running_user_totals_stream._counter = itertools.count()
    name = f"user_totals_{next(running_user_totals_stream._counter)}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per micro-batch per user; keep the last
    sink = spark.table(name)
    w_latest = sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    return w_latest
