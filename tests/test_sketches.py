"""Tests for the approximate-sketch and z-order layout queries.

The registry oracle pins the cross-engine contract (exact statistic +
error-band verdict); these tests pin the semantics the oracle can't see:
the band flag actually flips on a violated contract, the interleave is a
true bijection, and a z-sorted write produces per-file footer stats that
prune on both dimensions.
"""

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.sketches import (
    _ZBITS,
    _interleave_expr,
    layout_zorder_clustering,
    sketch_approx_distinct,
    sketch_approx_quantile,
)


def test_hll_within_band_on_testdata(spark):
    rows = sketch_approx_distinct(spark, SF_SMALL).collect()
    assert rows and all(r.hll_ok for r in rows)
    assert all(r.exact_users > 0 for r in rows)


def test_quantile_within_band_on_testdata(spark):
    rows = sketch_approx_quantile(spark, SF_SMALL).collect()
    assert rows and all(r.quantile_ok for r in rows)


def test_band_flag_flips_on_violation(spark):
    """The *_ok flag is a real assertion: shrink the band to ~0 against a
    deliberately coarse sketch (rsd=0.35 HLL, near Spark's 39% cap) and it
    must go false for at
    least one group — proving a broken sketch cannot pass silently."""
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.35).alias("approx"),
    )
    flags = [
        r.ok
        for r in agg.select(
            (F.abs(F.col("approx") - F.col("exact")) <= F.lit(0)).alias("ok")
        ).collect()
    ]
    assert not all(flags)


def test_interleave_is_bijective(spark):
    """All 256 (hi, lo) 4-bit pairs map to 256 distinct z keys in [0, 256)."""
    n = 2**_ZBITS
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("bigint").alias("hi"),
        (F.col("id") % n).cast("bigint").alias("lo"),
    )
    zs = [r.z for r in pairs.select(_interleave_expr("hi", "lo").alias("z")).collect()]
    assert sorted(zs) == list(range(n * n))


def test_zorder_runs_are_locally_bounded(spark):
    """Within one z key both bucket extents are a single value (the key
    determines both coordinates exactly) — the property that makes file
    min/max stats tight after a z-ordered write."""
    rows = layout_zorder_clustering(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.pb_min == r.pb_max
        assert r.mb_min == r.mb_max
        assert 0 <= r.z_key < 4**_ZBITS


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Range-partition + sort by z_key, write parquet, and check each file's
    min/max on BOTH raw dimensions covers well under the full domain — the
    footer-stats pruning a z-layout buys that a single-column sort cannot
    give to the second dimension."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    n = 2**_ZBITS
    bucketed = orders.select(
        F.least(
            F.lit(n - 1),
            (F.floor("o_totalprice").cast("bigint") / F.lit(40000)).cast("bigint"),
        ).alias("pb"),
        (F.month("o_orderdate") - 1).cast("bigint").alias("mb"),
    ).select("pb", "mb", _interleave_expr("pb", "mb").alias("z_key"))
    out = str(tmp_path / "zordered")
    bucketed.repartitionByRange(8, "z_key").sortWithinPartitions("z_key").write.parquet(
        out
    )
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("pb") - F.min("pb")).alias("pb_spread"),
            (F.max("mb") - F.min("mb")).alias("mb_spread"),
        )
        .collect()
    )
    assert len(per_file) > 1
    # every file covers a strict subset of both 16-value domains
    assert all(r.pb_spread < n - 1 or r.mb_spread < n - 1 for r in per_file)
    # and on average the windows are much tighter than the full domain
    avg_pb = sum(r.pb_spread for r in per_file) / len(per_file)
    avg_mb = sum(r.mb_spread for r in per_file) / len(per_file)
    assert avg_pb + avg_mb < 1.5 * (n - 1)
