"""Retail analytics operators over the TPC-H-shaped tables: market-basket
pair mining and a Benford first-digit audit.

Both extend the reference's retail-pipeline theme (store sales analytics;
`/root/reference/testing/sql_queries.ipynb` stops at grouped aggregates)
with the two classic next-step retail analyses, each expressed as a
shuffle-bounded DataFrame plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import QuerySpec, register_local

# ---------------------------------------------------------------------------
# basket_part_pairs — market-basket co-occurrence: which part pairs appear
# together in the same order, with support and lift. The pair expansion is
# a self-join keyed on l_orderkey, so its output is bounded by
# Σ_orders k_o·(k_o−1)/2 where k_o = distinct parts per order — TPC-H
# caps k_o at 7 (≤21 pairs/order), so the blowup is a small constant per
# order and the plan stays linear in lineitem at any scale. The rollup
# shuffles on the (part_a, part_b) pair key; top-k compiles to
# TakeOrderedAndProject, never a global sort.
#
# Determinism: support/lift are single IEEE division sequences over exact
# integer counts (identical operands both engines), ties in the top-k are
# broken by the pair key.
# ---------------------------------------------------------------------------
BASKET_TOP_K = 20


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select(F.countDistinct("l_orderkey").alias("n_orders"))
    per_part = li.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    ca = per_part.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    cb = per_part.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_orders")
                / F.col("ca")
                / F.col("cb"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(BASKET_TOP_K)
    )


BASKET_PAIRS_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
per_part AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_both,
  ROUND(CAST(n_both AS DOUBLE) / n.n_orders, 6) AS support,
  ROUND(CAST(n_both AS DOUBLE) * n.n_orders / ca.c / cb.c, 6) AS lift
FROM pairs
JOIN per_part ca ON pairs.part_a = ca.l_partkey
JOIN per_part cb ON pairs.part_b = cb.l_partkey
CROSS JOIN n
ORDER BY n_both DESC, part_a, part_b
LIMIT {BASKET_TOP_K}
"""


register_local(
    QuerySpec(
        "basket_part_pairs",
        basket_part_pairs,
        BASKET_PAIRS_SQL,
        ("MB1",),
        doc="market-basket part-pair mining with support and lift (top-20)",
    )
)


# ---------------------------------------------------------------------------
# qc_benford_totalprice — Benford's-law first-digit audit on order totals:
# the classic fraud/synthetic-data screen. The first digit is taken from
# the DECIMAL STRING of integer cents (never floor(log10(x)) — float log
# of a boundary value like 1000.0 can land on either side in different
# engines; the string route is exact everywhere). Output is one row per
# digit with the observed frequency, the Benford expectation, and the
# digit's χ² contribution fixed-pointed at 1e-6 — per-row arithmetic
# only, so no cross-row float-summation order exists for engines to
# disagree on. Plan: one 9-key groupBy over a projected scan.
# ---------------------------------------------------------------------------
#: log10(1 + 1/d) for d = 1..9 as shared literals (both engines read the
#: same doubles rather than each evaluating log10).
BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def qc_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        orders.select(d.alias("digit"))
        .filter(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    tot = obs.select(F.sum("n_obs").alias("n"))
    p = F.lit(None).cast("double")
    for dig, prob in BENFORD_P.items():
        p = F.when(F.col("digit") == dig, F.lit(prob)).otherwise(p)
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias("freq"),
            F.round(p, 6).alias("benford_p"),
            (
                F.round(
                    (F.col("n_obs") - F.col("n") * p)
                    * (F.col("n_obs") - F.col("n") * p)
                    / (F.col("n") * p)
                    * 1000000.0,
                    0,
                ).cast("long")
                / 1000000.0
            ).alias("chi2_contrib"),
        )
        .orderBy("digit")
    )


_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in BENFORD_P.items()
) + " END"

BENFORD_SQL = f"""
WITH obs AS (
  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS n_obs
  FROM orders
  GROUP BY 1
  HAVING digit >= 1
),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
dev AS (
  -- DuckDB promotes BIGINT*DOUBLE fine but SUM() yields HUGEINT→DECIMAL;
  -- the explicit DOUBLE casts pin the same IEEE operands Spark uses
  SELECT digit, n_obs, n,
    CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}) AS d,
    CAST(n AS DOUBLE) * ({_BENFORD_CASE}) AS expct
  FROM obs CROSS JOIN tot
)
SELECT digit, n_obs,
  ROUND(CAST(n_obs AS DOUBLE) / n, 6) AS freq,
  ROUND(CAST({_BENFORD_CASE} AS DOUBLE), 6) AS benford_p,
  CAST(ROUND(d * d / expct * 1000000.0, 0) AS BIGINT) / 1000000.0
    AS chi2_contrib
FROM dev
ORDER BY digit
"""


register_local(
    QuerySpec(
        "qc_benford_totalprice",
        qc_benford_totalprice,
        BENFORD_SQL,
        ("QB1",),
        doc="Benford first-digit audit on order totals (string-exact digits)",
    )
)
