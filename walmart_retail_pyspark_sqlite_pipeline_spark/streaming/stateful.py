"""Custom stateful streaming operators via ``applyInPandasWithState``.

Running per-user counters maintained as GroupState across micro-batches —
the Structured Streaming primitive for operators that windowed aggregation
cannot express (per-key custom state machines, CEP-ish logic, incremental
sketches).

Two surfaces:

- :func:`running_user_totals_stream` — per-user (count, value-sum) totals,
  the minimal stateful counter.
- :func:`user_stats_stateful` — per-user (count, first/last epoch extrema,
  purchase count) with a ``max_files_per_trigger`` knob so a test can force
  the input through MULTIPLE micro-batches and prove state genuinely
  survives a batch boundary; :func:`user_stats_batch` is its batch twin
  (the final emission per key must equal it).

Scale shape: state lives in the executor state store partitioned by the
group key; each micro-batch shuffles only that batch's rows to their key's
partition, and per-batch work is Arrow-vectorized pandas over only the keys
present in the batch — nothing is collected to the driver. State size is
bounded by a timeout policy in production
(``GroupStateTimeout.ProcessingTimeTimeout``) — kept NoTimeout here because
the availableNow demo terminates.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import normalize_event_ts
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n bigint, total double"

_name_counter = itertools.count()


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
    name = f"user_totals_{next(_name_counter)}"
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


# ---------------------------------------------------------------------------
# user_stats_stateful — richer per-key state (count + extrema + predicate
# counter) with a read-limit knob that forces multiple micro-batches, so a
# test can prove the state store carries state ACROSS batch boundaries
# rather than the whole input arriving in one batch.
# ---------------------------------------------------------------------------

STATS_STATE_SCHEMA = (
    "n_events bigint, first_ts_s bigint, last_ts_s bigint, n_purchases bigint"
)
STATS_OUTPUT_SCHEMA = (
    "user_id long, n_events long, first_ts_s long, last_ts_s long, "
    "n_purchases long"
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, first_ts, last_ts, n_purch = state.get
    else:
        n_events, first_ts, last_ts, n_purch = 0, None, None, 0
    for pdf in pdfs:
        n_events += len(pdf)
        lo = int(pdf["ts_s"].min())
        hi = int(pdf["ts_s"].max())
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
        n_purch += int((pdf["event_type"] == "purchase").sum())
    state.update((n_events, first_ts, last_ts, n_purch))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "first_ts_s": [first_ts],
            "last_ts_s": [last_ts],
            "n_purchases": [n_purch],
        }
    )


def user_stats_stateful(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the stateful per-user aggregator over a directory of events
    parquet files with Structured Streaming (availableNow trigger) and
    return the memory-sink table of UPDATE-mode emissions (all of them —
    callers pick the final row per key; a test counts them to prove
    multi-batch execution).

    ``max_files_per_trigger=1`` forces one micro-batch per input file;
    production would leave it unset.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    stream = normalize_event_ts(stream)
    prepared = stream.select(
        "user_id", "event_type", F.col("ts").cast("long").alias("ts_s")
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"user_stats_stateful_{next(_name_counter)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout=120):
        q.stop()
        raise TimeoutError("user_stats_stateful did not finish within 120 s")
    return spark.table(name)


def user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`user_stats_stateful` — the final state per user
    must equal this ``groupBy`` over the full input."""
    return events.select(
        "user_id", "event_type", F.col("ts").cast("long").alias("ts_s")
    ).groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_s").alias("first_ts_s"),
        F.max("ts_s").alias("last_ts_s"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_purchases"
        ),
    )
