"""Binned range join: interval-containment joins without a cross product.

Spark has no native range-join operator (Databricks' range-join hint is not
open-source Spark); a naive ``a.join(b, point BETWEEN lo AND hi)`` with no
equi-key degenerates to BroadcastNestedLoopJoin — O(|a|·|b|) and a
guaranteed 100 TB failure. The standard scale-safe rewrite is binning:

1. explode each interval to the fixed-width buckets it overlaps,
2. key each point by its bucket,
3. hash-join on the bucket id (an EQUI join Catalyst can shuffle/broadcast
   and AQE can re-plan), and
4. re-apply the exact range predicate as a residual filter.

Cost: |intervals| × (avg_span/bucket_width + 1) exploded rows, one hash
join, no nested loop. Pick ``bucket_width`` on the order of the typical
interval length so the explode factor stays ~2 and each bucket's population
stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    intervals: DataFrame,
    points: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Join each interval row to every point row with
    ``lo_col <= point_col <= hi_col`` (inclusive both ends, integer
    columns). Column names of the two inputs must be disjoint.

    Bucket math uses integer ``div`` so no float rounding can move a
    boundary.
    """
    overlap = set(intervals.columns) & set(points.columns)
    if overlap:
        raise ValueError(f"column name collision: {sorted(overlap)}")
    binned_i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} div {bucket_width}"),
                F.expr(f"{hi_col} div {bucket_width}"),
            )
        ),
    )
    binned_p = points.withColumn(
        "_bucket", F.expr(f"{point_col} div {bucket_width}")
    )
    return (
        binned_i.join(binned_p, "_bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bucket")
    )
