"""Lakehouse maintenance operators: small-file compaction and
partition-aware parquet upsert (MERGE)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.operators import (
    compact_small_files,
    upsert_parquet,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table


def _parquet_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return sorted(out)


def test_compact_small_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    ev = read_table(spark, SF_SMALL, "events")
    ev.repartition(32).write.parquet(path)  # simulate many tiny ingest files
    assert len(_parquet_files(path)) == 32

    stats = compact_small_files(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1  # ~40 KB of data, one target file
    assert stats["rows"] == 1000

    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("event_id")).collect()[0][0] == sum(range(1000))


def test_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    )
    ev.write.partitionBy("event_type").parquet(path)
    untouched_before = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if "event_type=purchase" not in f
    }

    # update 3 existing purchase rows and insert 2 new ones
    upd_keys = [
        r.event_id
        for r in ev.filter("event_type = 'purchase'").limit(3).collect()
    ]
    updates = spark.createDataFrame(
        [(k, 999.0) for k in upd_keys] + [(10**6, 1.0), (10**6 + 1, 2.0)],
        "event_id long, value double",
    ).select("event_id", F.lit("purchase").alias("event_type"), "value")

    stats = upsert_parquet(
        spark, path, updates, key_cols=["event_id"], partition_col="event_type"
    )
    assert stats["touched_partitions"] == ["purchase"]

    back = spark.read.parquet(path)
    assert back.count() == ev.count() + 2  # inserts appended, updates in place
    got = {
        r.event_id: r.value
        for r in back.filter(back.event_id.isin(upd_keys + [10**6])).collect()
    }
    assert all(got[k] == 999.0 for k in upd_keys)
    assert got[10**6] == 1.0
    # non-updates inside the touched partition survive the rewrite
    keep = ev.filter(
        (ev.event_type == "purchase") & ~ev.event_id.isin(upd_keys)
    ).count()
    assert back.filter(
        (back.event_type == "purchase")
        & (back.event_id < 10**6)
        & (back.value != 999.0)
    ).count() == keep

    # untouched partitions: exact same files, never rewritten
    untouched_after = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if "event_type=purchase" not in f
    }
    assert untouched_after == untouched_before
