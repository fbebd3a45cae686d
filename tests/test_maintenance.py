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


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    """Incremental materialized-rollup maintenance: building from days 1-25
    then folding in a days-23+ batch (3 overlap days prove additive merge)
    must equal the rollup recomputed from all events — and days the batch
    does not touch keep their original parquet files."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.pipeline import (
        build_rollup,
        hourly_rollup,
        incremental_rollup_merge,
    )

    ev = read_table(spark, SF_SMALL, "events")
    cut_lo, cut_hi = "2024-01-23", "2024-01-26"
    batch1 = ev.filter(F.to_date("ts") < cut_hi)
    batch2 = ev.filter(F.to_date("ts") >= cut_lo)
    # rebuild batch1's overlap days from scratch is NOT what happens: the
    # increment must only ADD batch2-only events, so feed the merge just
    # the rows not already rolled up
    batch2_new = ev.filter(F.to_date("ts") >= cut_hi)

    path = str(tmp_path / "rollup")
    build_rollup(spark, batch1, path)
    before = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if f.split("/d=")[1][:10] < cut_hi
    }

    stats = incremental_rollup_merge(spark, path, batch2_new)
    assert min(stats["touched_days"]) >= cut_hi

    cols = ["d", "hour_s", "event_type", "n_events", "cents"]
    got = (
        spark.read.parquet(path)
        .select(*cols)
        .orderBy("d", "hour_s", "event_type")
        .collect()
    )
    want = (
        hourly_rollup(ev)
        .select(*cols)
        .orderBy("d", "hour_s", "event_type")
        .collect()
    )
    assert got == want

    after = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if f.split("/d=")[1][:10] < cut_hi
    }
    assert after == before  # untouched history never rewritten

    # and an OVERLAPPING batch merges additively rather than replacing:
    path2 = str(tmp_path / "rollup2")
    build_rollup(spark, batch1, path2)
    incremental_rollup_merge(spark, path2, batch2)
    doubled = spark.read.parquet(path2)
    overlap_want = (
        hourly_rollup(ev.filter(
            (F.to_date("ts") >= cut_lo) & (F.to_date("ts") < cut_hi)
        ))
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    overlap_got = (
        doubled.filter((F.col("d") >= cut_lo) & (F.col("d") < cut_hi))
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert overlap_got == 2 * overlap_want  # counted once in base + once in delta


def test_upsert_is_idempotent(spark, tmp_path):
    """Applying the same update batch twice must be a no-op the second time
    — the property that makes the merge safe to retry after a failed job."""
    path = str(tmp_path / "tbl")
    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    )
    ev.write.partitionBy("event_type").parquet(path)
    updates = spark.createDataFrame(
        [(1, "purchase", 42.0), (10**6, "purchase", 7.0)],
        "event_id long, event_type string, value double",
    )
    upsert_parquet(spark, path, updates, ["event_id"], "event_type")
    once = sorted(
        (r.event_id, r.event_type, r.value)
        for r in spark.read.parquet(path).collect()
    )
    upsert_parquet(spark, path, updates, ["event_id"], "event_type")
    twice = sorted(
        (r.event_id, r.event_type, r.value)
        for r in spark.read.parquet(path).collect()
    )
    assert once == twice


def test_delete_rows_touched_partitions_only(spark, tmp_path):
    """GDPR-delete: tombstoned keys disappear, only partitions containing
    them are rewritten, absent keys are a no-op (idempotent)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.operators import delete_rows

    path = str(tmp_path / "tbl")
    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    )
    ev.write.partitionBy("event_type").parquet(path)

    doomed = [
        r.event_id
        for r in ev.filter("event_type = 'click'").limit(4).collect()
    ]
    untouched_before = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if "event_type=click" not in f
    }
    tomb = spark.createDataFrame([(k,) for k in doomed], "event_id long")
    stats = delete_rows(
        spark, path, tomb, key_cols=["event_id"], partition_col="event_type"
    )
    assert stats["touched_partitions"] == ["click"]
    assert stats["deleted_rows"] == 4

    back = spark.read.parquet(path)
    assert back.count() == ev.count() - 4
    assert back.filter(back.event_id.isin(doomed)).count() == 0
    untouched_after = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if "event_type=click" not in f
    }
    assert untouched_after == untouched_before

    # idempotent: deleting the same (now absent) keys is a clean no-op
    stats2 = delete_rows(
        spark, path, tomb, key_cols=["event_id"], partition_col="event_type"
    )
    assert stats2 == {"touched_partitions": [], "deleted_rows": 0, "kept_rows": 0}
    assert spark.read.parquet(path).count() == ev.count() - 4


def test_expire_partitions_is_directory_level(spark, tmp_path):
    """TTL drops whole expired partitions without touching surviving
    files (no rewrite, no Spark job over row data)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.operators import (
        expire_partitions,
    )

    path = str(tmp_path / "tbl")
    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    ev.write.partitionBy("day").parquet(path)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    cutoff = days[3]
    survivors_before = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if not any(f"day={d}" in f for d in days[:3])
    }

    stats = expire_partitions(spark, path, keep=lambda d: d >= cutoff)
    assert stats["dropped"] == days[:3]
    assert stats["kept"] == days[3:]

    back = spark.read.parquet(path)
    got_days = sorted(
        r.day
        for r in back.select(F.col("day").cast("string").alias("day"))
        .distinct()
        .collect()
    )
    assert got_days == days[3:]
    assert back.count() == ev.filter(F.col("day") >= cutoff).count()
    survivors_after = {
        f: os.path.getmtime(f)
        for f in _parquet_files(path)
        if not any(f"day={d}" in f for d in days[:3])
    }
    assert survivors_after == survivors_before


def test_vacuum_removes_stale_debris_only(spark, tmp_path):
    """Stale _temporary/compact leftovers go; fresh debris and data stay."""
    import time

    from walmart_retail_pyspark_sqlite_pipeline_spark.operators import vacuum

    path = str(tmp_path / "tbl")
    ev = read_table(spark, SF_SMALL, "events").select("event_id", "value")
    ev.write.parquet(path)

    stale_tmp = tmp_path / "tbl" / "_temporary"
    stale_tmp.mkdir()
    (stale_tmp / "part-junk").write_text("x")
    old_swap = tmp_path / "tbl.__compact_old__"
    old_swap.mkdir()
    fresh_tmp = tmp_path / "tbl" / "year=2024" / "_temporary"
    fresh_tmp.mkdir(parents=True)

    past = time.time() - 48 * 3600
    os.utime(stale_tmp, (past, past))
    os.utime(old_swap, (past, past))

    stats = vacuum(path, older_than_s=24 * 3600)
    assert sorted(stats["removed"]) == ["tbl.__compact_old__", "tbl/_temporary"]
    assert not stale_tmp.exists() and not old_swap.exists()
    assert fresh_tmp.exists()  # inside grace period: a live job's staging
    assert spark.read.parquet(path).count() == ev.count()
