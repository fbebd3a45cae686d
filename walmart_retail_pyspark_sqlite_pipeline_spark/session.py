"""SparkSession factory tuned for this engine.

The reference builds its session at
``/root/reference/src/pipeline_orchestrator.py:42-62`` (local[*],
shuffle.partitions=8, sqlite-jdbc package). We keep the config-driven spirit
but default to scale-friendly settings: AQE on (runtime partition coalescing
+ skew-join handling), explicit shuffle partitions, UTC session timezone so
date math is deterministic across hosts, and Arrow enabled for the pandas
boundaries used by the multimodal/similarity extensions.

ANSI note: Spark 4 enables ANSI mode by default. The engine's own code never
relies on session-level cast semantics — parity-critical lenient casts (the
reference's ``"NA" -> NULL`` behavior, SURVEY.md §1.2) use ``try_cast``
explicitly — so the engine works under either setting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


# Cached scan-split decisions for undersplit(), keyed by the caller's
# (plan-site, sf_dir) string. One probe per key per process: the probe is a
# DataFrame→RDD conversion (full analysis + deserializer plan — cheap but
# not free), and caching it also keeps the guarded plan SHAPE stable within
# a session even if the file layout changes mid-run (ADVICE r14: the
# per-call probe both re-paid the conversion and could split one sf_dir
# into two divergent cache entries).
_SPLIT_DECISIONS: dict[str, bool] = {}


def undersplit(df, key: str) -> bool:
    """True when ``df``'s scan yields fewer partitions than the session's
    parallelism — the data-adaptive trigger for the "repartition
    immediately after an under-split read" guards (guide §2.5). Never
    fires on a well-split 100 TB scan; on a local single-row-group parquet
    file it restores the parallelism the input cannot supply."""
    hit = _SPLIT_DECISIONS.get(key)
    if hit is None:
        hit = df.rdd.getNumPartitions() < default_parallelism()
        _SPLIT_DECISIONS[key] = hit
    return hit


def get_spark(
    app_name: str = "walmart-retail-pyspark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Defaults are sized for local[N] testing but every knob is the same one
    you would set on a real cluster; nothing here assumes single-node.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Sized for the machine, not the data: local-mode default driver
        # heap is 1g, which forces constant GC once a cached index plus a
        # dozen broadcast relations are resident (measured ~10% of bench
        # wall-clock). On a real cluster this is spark.executor.memory.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        # Kryo serializes the broadcast/shuffle records ~25% faster than
        # Java serialization (measured on the dedup family); on a cluster
        # this also shrinks network bytes.
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
