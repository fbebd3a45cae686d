"""Lakehouse table maintenance on plain parquet: small-file compaction and
partition-aware upsert (MERGE).

At 100 TB these jobs are what keeps a parquet lake scannable: a fact table
ingested by many writers accretes thousands of KB-sized files per partition
(kills scan throughput — footer parsing and task-per-file overhead dominate),
and CDC-style corrections need MERGE semantics without rewriting the whole
table. A table format (Delta/Iceberg) gives both transactionally; neither is
available in this container, so these operators implement the same moves on
raw directories with a write-to-temp + swap protocol. The data-shaping parts
(repartition-to-size, touched-partition pruning, key anti-join) are exactly
what the table formats run underneath.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    The rewrite is one distributed job: scan → ``repartition(n)`` →  write to
    a sibling temp dir, then an atomic-ish directory swap. ``n`` is sized
    from the *current compressed* bytes, which under-counts the in-memory
    row size — fine for compaction, where the failure mode that matters is
    too MANY small files, not a file 2x over target. Returns before/after
    file counts so a maintenance loop can assert progress.

    On an object store the swap step is a manifest/metadata commit (Delta,
    Iceberg) rather than a rename; everything before it is unchanged.
    """
    before_files = sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    total = _dir_bytes(path)
    n = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    df = spark.read.parquet(path)
    writer = df.repartition(n).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after_files = sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return {
        "rows": rows,
        "files_before": before_files,
        "files_after": after_files,
        "target_partitions": n,
    }


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> dict:
    """MERGE ``updates`` into a hive-partitioned parquet table by key.

    Semantics: rows whose ``key_cols`` match an update are replaced, new
    keys are inserted; everything else is byte-identical untouched.

    The scale move is *touched-partition pruning*: only partitions that
    appear in ``updates`` are read back, anti-joined, unioned and rewritten
    — with ``partitionOverwriteMode=dynamic`` the overwrite deletes exactly
    the partitions present in the written data, so a 1-partition fix to a
    10,000-partition table is a 1-partition job end-to-end. The merged
    slice is eagerly materialized (``localCheckpoint``) before the write
    because the write overwrites the very files the plan would lazily
    re-read (on a cluster: checkpoint to reliable storage, or let a table
    format's snapshot isolation make this a non-issue).
    """
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    base = spark.read.parquet(path)
    base_touched = base.filter(base[partition_col].isin(touched))
    merged = base_touched.join(
        updates.select(*key_cols), key_cols, "left_anti"
    ).unionByName(updates).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"touched_partitions": sorted(touched), "merged_rows": merged.count()}


def delete_rows(
    spark: SparkSession,
    path: str,
    tombstones: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> dict:
    """Targeted row deletion (the GDPR-erasure / right-to-be-forgotten job)
    on a hive-partitioned parquet table.

    Same touched-partition discipline as :func:`upsert_parquet`: only
    partitions containing a tombstoned key are read back, anti-joined
    against the tombstone keys, and rewritten with dynamic partition
    overwrite — untouched partitions stay byte-identical (provable, and
    proven in the test). Deleting 100 users from a 10,000-partition table
    reads and rewrites only the partitions those users appear in.

    The tombstone side is usually tiny (a key list) → Catalyst broadcasts
    both the partition-discovery semi-join and the anti-join. A deleted key
    absent from the table is a no-op, not an error (idempotent — erasure
    jobs are retried).
    """
    base = spark.read.parquet(path)
    keys = tombstones.select(*key_cols).distinct()
    touched = [
        r[0]
        for r in base.join(keys, key_cols, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not touched:
        return {"touched_partitions": [], "deleted_rows": 0, "kept_rows": 0}
    base_touched = base.filter(base[partition_col].isin(touched))
    before = base_touched.count()
    kept = base_touched.join(keys, key_cols, "left_anti").localCheckpoint(
        eager=True
    )
    kept_rows = kept.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "touched_partitions": sorted(touched),
        "deleted_rows": before - kept_rows,
        "kept_rows": kept_rows,
    }


def expire_partitions(
    spark: SparkSession,
    path: str,
    keep: "callable",
) -> dict:
    """Retention/TTL: drop whole hive partitions whose value fails ``keep``.

    The cheapest possible data-lifecycle job — no Spark job touches row
    data at all: partition values come from directory names, and expiry is
    a directory delete (on an object store: a prefix delete / metadata
    commit). A predicate-based ``delete_rows`` would scan and rewrite;
    TTL by partition never should. Surviving partitions keep their exact
    files.

    ``keep`` receives the partition's string value (e.g. ``"2024-01-03"``
    for ``day=2024-01-03``) and returns True to retain.
    """
    dropped, kept = [], []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if not os.path.isdir(full) or "=" not in entry:
            continue
        value = entry.split("=", 1)[1]
        if keep(value):
            kept.append(value)
        else:
            shutil.rmtree(full)
            dropped.append(value)
    return {"dropped": dropped, "kept": kept}


def vacuum(
    path: str,
    older_than_s: float = 24 * 3600,
    _now: float | None = None,
) -> dict:
    """Remove write debris a crashed job can leave inside a table directory:
    Spark's ``_temporary`` staging dirs and this module's ``__compact_tmp__``
    / ``__compact_old__`` swap leftovers.

    Only debris older than ``older_than_s`` goes (a LIVE job's staging dir
    must survive its own write — the same grace-period rule Delta's VACUUM
    applies to unreferenced files). Data files are never touched: matching
    is by the writer-protocol names, not by reachability analysis, so this
    is safe to run concurrently with readers.
    """
    import time as _time

    now = _now if _now is not None else _time.time()
    removed: list[str] = []
    candidates: list[str] = []
    base = path.rstrip("/")
    for suffix in (".__compact_tmp__", ".__compact_old__"):
        candidates.append(base + suffix)
    for root, dirs, _files in os.walk(base):
        for d in dirs:
            if d == "_temporary":
                candidates.append(os.path.join(root, d))
    for c in candidates:
        if os.path.exists(c) and now - os.path.getmtime(c) >= older_than_s:
            shutil.rmtree(c)
            removed.append(os.path.relpath(c, os.path.dirname(base)))
    return {"removed": sorted(removed)}
