"""Approximate-sketch and data-layout operators.

At 100 TB, exact ``COUNT(DISTINCT)`` and exact quantiles force a full
shuffle of every distinct value; the scale path is a mergeable sketch
(HyperLogLog for cardinality, a quantile sketch for order statistics)
whose partial states combine map-side and never materialize the value
set. Spark ships both (`approx_count_distinct`, `percentile_approx`);
this module registers them with an oracle design that stays value-exact
across engines even though the raw estimates are implementation-defined:

    The query outputs the EXACT statistic (both engines agree bit-exact)
    plus a boolean ``*_ok`` flag asserting the engine's own sketch lands
    inside a stated error band. DuckDB checks ITS sketch against the same
    band. The driver's value hash then compares (exact value, contract
    satisfied) — deterministic — while the test still fails loudly on
    either side if a sketch ever violates its error contract.

The z-order query demonstrates the layout half of scale: interleaving the
bits of two bucketized dimensions into one sort key so a single
``repartitionByRange + sortWithinPartitions`` write gives parquet files
whose min/max footer stats are tight on BOTH dimensions — scan pruning
for two-predicate queries without maintaining two copies of the data.
All bucket/interleave math is integer-only, so the DuckDB twin is exact.

Extensions beyond the reference (its only cardinality op is the exact
``dropDuplicates``/``countDistinct`` family, src/quality_checks.py:34-47);
these are the sketch counterparts a 1000-executor deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import _interleave
from ..sources import read_table
from .registry import QuerySpec, register, register_local

# Relative error band asserted for the HLL estimate. Spark runs at
# rsd=0.01 (~1% standard error) and DuckDB's HLL is ~1.6% typical —
# a 5% band is >3 sigma for both, so the flag is deterministic-true on
# contract-honoring implementations yet still catches a broken sketch.
_HLL_BAND = 0.05

# Quantile band: fraction of the per-group value RANGE the approximate
# median may deviate from the exact interpolated median.
_QUANTILE_BAND = 0.02


def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality per event_type, graded against exact NDV.

    One aggregation pass computes both: at scale you would drop the exact
    branch and keep only the mergeable HLL (map-side partials, no shuffle
    of the distinct set); here the exact branch is the grader.
    """
    events = read_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
    )
    return (
        agg.select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(F.lit(1), F.col("exact_users") * _HLL_BAND)
            ).alias("hll_ok"),
        )
        .orderBy("event_type")
    )


SKETCH_APPROX_DISTINCT_SQL = f"""
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
    <= GREATEST(1, COUNT(DISTINCT user_id) * {_HLL_BAND}) AS hll_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def sketch_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median per order status, graded against the exact one.

    ``percentile_approx`` is the KLL/GK-style mergeable sketch Spark uses
    at scale; ``percentile`` is the exact interpolated order statistic
    both engines define identically (see q21). The output carries the
    exact value and the band verdict on the sketch.
    """
    orders = read_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("exact_median"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("price_range"),
    )
    return (
        agg.select(
            "o_orderstatus",
            F.round("exact_median", 2).alias("exact_median"),
            (
                F.abs(F.col("approx_median") - F.col("exact_median"))
                <= F.col("price_range") * _QUANTILE_BAND
            ).alias("quantile_ok"),
        )
        .orderBy("o_orderstatus")
    )


SKETCH_APPROX_QUANTILE_SQL = f"""
SELECT o_orderstatus,
  ROUND(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
  ABS(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
    <= (MAX(o_totalprice) - MIN(o_totalprice)) * {_QUANTILE_BAND} AS quantile_ok
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Z-order layout: 4 bits of price bucket interleaved with 4 bits of order
# month. Integer-only math end to end (FLOOR to whole dollars, integer DIV
# for buckets, &/shift for the interleave) so both engines agree bit-exact.
# --------------------------------------------------------------------------
_ZBITS = 4  # 16 buckets per dimension -> 8-bit z key


def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key over (price bucket, order month) with locality stats.

    At scale the key feeds ``repartitionByRange("z_key").sortWithinPartitions
    ("z_key")`` before the parquet write, so every file's min/max footer is
    tight on both dimensions and either predicate prunes files. Here the
    query groups by the key and reports each z-run's bucket extents — the
    spread (max-min per key) is what the writer's pruning benefit depends
    on, and the oracle pins the interleave math exactly.
    """
    orders = read_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.floor("o_totalprice").cast("bigint")).alias("p_min"),
        F.max(F.floor("o_totalprice").cast("bigint")).alias("p_max"),
    )
    bucketed = (
        orders.join(F.broadcast(bounds))  # 1-row bounds: broadcast, no shuffle
        .select(
            F.least(
                F.lit(2**_ZBITS - 1),
                F.expr(
                    "(CAST(FLOOR(o_totalprice) AS BIGINT) - p_min)"
                    f" DIV (((p_max - p_min) DIV {2**_ZBITS}) + 1)"
                ),
            ).alias("price_bucket"),
            (F.month("o_orderdate") - 1).cast("bigint").alias("month_bucket"),
        )
    )
    return (
        bucketed.select(
            _interleave(
                F.col("price_bucket"), F.col("month_bucket"), bits=_ZBITS
            ).alias("z_key"),
            "price_bucket",
            "month_bucket",
        )
        .groupBy("z_key")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("price_bucket").alias("pb_min"),
            F.max("price_bucket").alias("pb_max"),
            F.min("month_bucket").alias("mb_min"),
            F.max("month_bucket").alias("mb_max"),
        )
        .orderBy("z_key")
    )


def _interleave_sql(hi: str, lo: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({hi} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({lo} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


LAYOUT_ZORDER_SQL = f"""
WITH bounds AS (
  SELECT MIN(CAST(FLOOR(o_totalprice) AS BIGINT)) AS p_min,
         MAX(CAST(FLOOR(o_totalprice) AS BIGINT)) AS p_max
  FROM orders
), bucketed AS (
  SELECT
    LEAST({2**_ZBITS - 1},
          (CAST(FLOOR(o_totalprice) AS BIGINT) - p_min)
            // (((p_max - p_min) // {2**_ZBITS}) + 1)) AS price_bucket,
    CAST(MONTH(o_orderdate) - 1 AS BIGINT) AS month_bucket
  FROM orders, bounds
)
SELECT {_interleave_sql("price_bucket", "month_bucket")} AS z_key,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  MIN(price_bucket) AS pb_min, MAX(price_bucket) AS pb_max,
  MIN(month_bucket) AS mb_min, MAX(month_bucket) AS mb_max
FROM bucketed
GROUP BY z_key
ORDER BY z_key
"""


# round-3 rotation: the two mergeable-sketch queries are driver-graded
# (sketch_approx_quantile also carries the exported A9 slot freed by q21).
for _spec in [
    QuerySpec(
        "sketch_approx_distinct",
        sketch_approx_distinct,
        SKETCH_APPROX_DISTINCT_SQL,
        ("A2",),
        doc="HLL cardinality sketch graded against exact NDV (error-band oracle)",
    ),
    QuerySpec(
        "sketch_approx_quantile",
        sketch_approx_quantile,
        SKETCH_APPROX_QUANTILE_SQL,
        ("A9",),
        doc="mergeable quantile sketch graded against the exact median",
    ),
]:
    register(_spec)

register_local(
    QuerySpec(
        "layout_zorder_clustering",
        layout_zorder_clustering,
        LAYOUT_ZORDER_SQL,
        ("O1",),
        doc="z-order bit-interleaved sort key for two-dimension file pruning",
    )
)


# ---------------------------------------------------------------------------
# sketch_hll_manual — HyperLogLog built FROM SCRATCH out of portable
# integer expressions, so BOTH engines compute the IDENTICAL estimate
# (unlike approx_count_distinct, whose sketch is implementation-defined
# and only contract-checkable — see module docstring). This is the
# mergeability story made concrete: the per-bucket state is max(rho),
# which combines map-side like any max, so per-type registers merge
# across 1000 executors with no value-set shuffle.
#
# Construction (per event_type, m = 256 buckets): the id is first
# reduced into the affine family's documented < 2^31 input domain
# (x = ((user_id mod P) + P) mod P — nonnegative for any BIGINT id, so
# a·x never overflows int64 where DuckDB would raise and Spark would
# silently wrap), then h = (a·x+b) mod (2^31−1); bucket = h mod m; the
# remaining ~23-bit word w = h div m has rho = 24 − bitlength(w) (24 for
# w = 0); the harmonic sum Σ 2^(−M_j) is held EXACTLY as integers
# Σ 2^(24−M_j) (≤ m·2^24 < 2^63), empty buckets contributing 2^24 each;
# the only float step is the final alpha·m²·2^24 / Σ division — identical
# operands both engines. The small-range regime (raw ≤ 2.5·m with empty
# buckets) switches to linear counting m·ln(m/V) per the original
# algorithm — that ln is fixed-pointed at 1e-6 (libm ln is not
# correctly-rounded) so the branch stays engine-identical too.
# ---------------------------------------------------------------------------
_HLL_M = 256
_HLL_A, _HLL_B = 735632797, 1234567  # MINHASH_PERMS[0]
_HLL_P = 2147483647


def sketch_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    x = (F.col("user_id") % _HLL_P + _HLL_P) % _HLL_P
    h = (x * _HLL_A + _HLL_B) % _HLL_P
    hashed = ev.select(
        "event_type",
        (h % _HLL_M).alias("bucket"),
        F.expr(
            f"(((user_id % {_HLL_P} + {_HLL_P}) % {_HLL_P})"
            f" * {_HLL_A} + {_HLL_B}) % {_HLL_P} DIV {_HLL_M}"
        ).alias("w"),
    ).select(
        "event_type",
        "bucket",
        F.when(F.col("w") == 0, 24)
        .otherwise(24 - F.length(F.expr("bin(w)")))
        .alias("rho"),
    )
    regs = hashed.groupBy("event_type", "bucket").agg(F.max("rho").alias("m_j"))
    # CASTs keep Spark's literal arithmetic in DOUBLE (its SQL parser
    # types bare decimal literals as DECIMAL; DuckDB's types them DOUBLE)
    alpha_num = (
        f"(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST(1.079 AS DOUBLE) / CAST({_HLL_M} AS DOUBLE)))"
        f" * CAST({_HLL_M} AS DOUBLE) * CAST({_HLL_M} AS DOUBLE)"
        f" * CAST(16777216 AS DOUBLE)"
    )
    per_type = regs.groupBy("event_type").agg(
        F.count("*").alias("n_used"),
        F.sum(F.expr("CAST(POW(2, 24 - m_j) AS BIGINT)")).alias("s_used"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    raw = F.expr(f"{alpha_num} / (s_used + ({_HLL_M} - n_used) * 16777216)")
    n_empty = F.lit(_HLL_M) - F.col("n_used")
    lc = (
        F.lit(_HLL_M)
        * F.round(
            F.log(F.lit(float(_HLL_M)) / n_empty.cast("double")) * 1000000.0, 0
        ).cast("long")
        / 1000000.0
    )
    est = F.when((raw <= 2.5 * _HLL_M) & (n_empty > 0), lc).otherwise(raw)
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (F.lit(_HLL_M) - F.col("n_used")).cast("bigint").alias("n_empty_buckets"),
            F.round(est, 6).alias("hll_estimate"),
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


SKETCH_HLL_MANUAL_SQL = f"""
WITH hashed AS (
  SELECT event_type,
    ((((user_id % {_HLL_P} + {_HLL_P}) % {_HLL_P})
      * {_HLL_A} + {_HLL_B}) % {_HLL_P}) % {_HLL_M} AS bucket,
    ((((user_id % {_HLL_P} + {_HLL_P}) % {_HLL_P})
      * {_HLL_A} + {_HLL_B}) % {_HLL_P}) // {_HLL_M} AS w
  FROM events
),
rho AS (
  SELECT event_type, bucket,
    CASE WHEN w = 0 THEN 24 ELSE 24 - length(bin(w)) END AS rho
  FROM hashed
),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS m_j
  FROM rho GROUP BY event_type, bucket
),
per_type AS (
  SELECT event_type,
    COUNT(*) AS n_used,
    CAST(SUM(CAST(POW(2, 24 - m_j) AS BIGINT)) AS BIGINT) AS s_used
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
),
est AS (
  SELECT event_type, n_used,
    (0.7213 / (1.0 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M}
      * 16777216.0 / (s_used + ({_HLL_M} - n_used) * 16777216) AS raw,
    {_HLL_M} - n_used AS n_empty
  FROM per_type
),
fin AS (
  SELECT event_type, n_empty,
    CASE WHEN raw <= 2.5 * {_HLL_M} AND n_empty > 0
      THEN {_HLL_M} * CAST(ROUND(ln(CAST({_HLL_M} AS DOUBLE) / n_empty)
                                   * 1000000.0, 0) AS BIGINT) / 1000000.0
      ELSE raw END AS hll_estimate
  FROM est
)
SELECT fin.event_type, exact_distinct,
  CAST(n_empty AS BIGINT) AS n_empty_buckets,
  ROUND(hll_estimate, 6) AS hll_estimate,
  ROUND((hll_estimate - exact_distinct) / exact_distinct, 6) AS rel_err
FROM fin JOIN exact ON fin.event_type = exact.event_type
ORDER BY fin.event_type
"""


register_local(
    QuerySpec(
        "sketch_hll_manual",
        sketch_hll_manual,
        SKETCH_HLL_MANUAL_SQL,
        ("SK3",),
        doc="from-scratch HyperLogLog with engine-identical integer registers",
    )
)
