"""Generic JDBC sink for parallel-writable warehouses.

For SQLite specifically use ``sinks.sqlite`` (single-writer by
construction). This writer is for real JDBC targets: it exposes the two
knobs that matter at scale — ``numPartitions`` (parallel connections) and
``batchsize`` (rows per round-trip). Requires the target's JDBC driver jar
on the Spark classpath; not exercised in this container (no driver jars
are bundled), gated behind an explicit call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "overwrite",
    num_partitions: int | None = None,
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    if num_partitions:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
