"""Distributed exact global ranking — the scale-safe replacement for an
unpartitioned ``row_number()``/``ntile()`` window.

A Window with no PARTITION BY funnels every input row through ONE task —
the single window shape that walls at 100 TB (the round-13 plan-audit
ratchet, ``tests/test_plan_audit.py::UNPARTITIONED_WINDOW_ALLOWED``, bans
it on data-sized inputs). These operators compute the SAME exact answers
with partition-parallel plans:

1. range-repartition on the total-order sort key (every engine's
   distributed sort primitive — boundaries come from a sampling pass, but
   the RANK is invariant to where the boundaries land because the order is
   total);
2. ``sortWithinPartitions`` + ``monotonically_increasing_id`` give each
   row its dense local offset (the id's documented layout: partition id in
   the upper 31 bits, record offset in the lower 33);
3. one tiny aggregate — one row per shuffle partition, cluster-config-
   bounded, never data-sized — yields cumulative partition counts, which a
   broadcast join adds back as the exact 1-based global rank.

The sort keys MUST form a total order (append a unique key as the final
tiebreak); with ties the local sort order — and hence the rank — would be
nondeterministic, exactly as an unpartitioned ``row_number()`` window
would be.

No reference counterpart (the reference has no window surface at all);
this is engine infrastructure demanded by Spark's execution model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["global_row_number", "global_ntile"]

_LOW33 = (1 << 33) - 1


def _exact_idiv(a: Column, b: Column) -> Column:
    """Exact integer division of non-negative bigint columns: subtract the
    remainder first so the double-precision divide is exact (an integer
    quotient <= 2^53 is exactly representable and correctly rounded)."""
    return ((a - a % b) / b).cast("long")


def global_row_number(
    df: DataFrame, sort_cols, out: str = "rn"
) -> DataFrame:
    """Append the exact 1-based global row number over the total order
    ``sort_cols`` (a list of Column expressions, e.g. ``[F.desc("score"),
    F.col("id")]``) without any data-sized single-partition stage.

    The ranked frame is consumed by TWO branches (the partition-count
    aggregate and the offsets join), and both its building blocks are
    nondeterministic per physical instance: RangePartitioner samples its
    bounds with a per-RDD seed, and ``monotonically_increasing_id`` is
    layout-dependent. The ``cache()`` below is therefore
    CORRECTNESS-load-bearing, not an optimization (ADVICE r13, medium):
    it pins both branches to ONE InMemoryRelation — one physical range
    exchange, one id assignment — so the counts the offsets are derived
    from always describe the exact layout the join side reads, with NO
    dependence on exchange-reuse or AQE configs. (Even on partial cache
    eviction the recompute reuses the same ShuffledRowRDD instance, whose
    range bounds are fixed at construction, and the per-partition sort is
    a total order — so recomputed partitions are bit-identical.)
    ``tests/test_scale_patterns.py`` asserts window-parity with BOTH
    ``spark.sql.exchange.reuse`` and AQE disabled. The cache is
    rank-grain (one row per input row) and session-lifetime; callers that
    rank in a loop should ``spark.catalog.clearCache()`` between batches.
    """
    ranked = (
        df.repartitionByRange(*sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn("_idx", F.col("_mid").bitwiseAND(F.lit(_LOW33)))
        .cache()
    )
    counts = ranked.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # cumulative offsets over the partition-count table: ONE row per
    # shuffle partition — the only unpartitioned window in the scheme,
    # bounded by cluster config, never by data
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_idx") + F.col("_off") + F.lit(1)).cast("long"))
        .drop("_mid", "_pid", "_idx", "_off")
    )


def global_ntile(
    df: DataFrame, sort_cols, n_col: str, buckets: int, out: str
) -> DataFrame:
    """Exact ``ntile(buckets)`` over the total order ``sort_cols``.
    ``n_col`` must hold the frame's total row count (a 1-row broadcast
    aggregate the caller already pays for, so the scheme adds no extra
    pass over the data).

    Bucket formula (Spark/DuckDB ntile semantics): with n rows, q = n div
    buckets and rem = n mod buckets, the first rem buckets hold q+1 rows —
    bucket(r) = ceil(r/(q+1)) while r <= rem*(q+1), else
    rem + ceil((r - rem*(q+1))/q). All arithmetic is exact-integer.
    """
    with_rank = global_row_number(df, sort_cols, out="_gr")
    r = F.col("_gr")
    n = F.col(n_col)
    q = _exact_idiv(n, F.lit(buckets))
    rem = n % buckets
    bucket = F.when(
        r <= rem * (q + 1), _exact_idiv(r + q, q + 1)
    ).otherwise(
        rem + _exact_idiv(r - rem * (q + 1) + q - 1, F.greatest(q, F.lit(1)))
    )
    return with_rank.withColumn(out, bucket.cast("bigint")).drop("_gr")
