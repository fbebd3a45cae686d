"""Oracle-graded constraint-suite query.

Bridges the Deequ-style declarative suite (`quality/constraints.py`,
SURVEY tag QC5) into the value-exact oracle gate: one representative
suite over the star tables — row-level checks compiled into a single
aggregate pass, a key-uniqueness shuffle, and an FK anti-join — emitted
as ``(constraint, violations)`` rows that DuckDB recomputes with plain
COUNT/CASE SQL. The reference has no constraint layer at all (its QC is
profile-based, src/quality_checks.py:105-130); this query is the proof
the suite's counters mean exactly what the equivalent SQL says.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..quality.constraints import (
    accepted_values,
    foreign_key,
    in_range,
    not_null,
    satisfies,
    unique,
    validation_frame,
)
from ..sources import read_table
from .registry import QuerySpec, register_local


def qc_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    suite = [
        not_null("o_orderkey"),
        in_range("o_totalprice", 0, 1_000_000),
        accepted_values("o_orderstatus", ("F", "O", "P")),
        satisfies(
            "order_in_decade",
            (F.year("o_orderdate") >= 1992) & (F.year("o_orderdate") <= 1999),
        ),
        unique("o_orderkey"),
        foreign_key("o_custkey", customer, "c_custkey"),
    ]
    return (
        validation_frame(orders, suite)
        # "constraint" is an ANSI reserved word; export a neutral name
        .select(F.col("constraint").alias("check_name"), "violations")
        .orderBy("check_name")
    )


QC_CONSTRAINT_SUITE_SQL = """
SELECT * FROM (
  SELECT 'not_null(o_orderkey)' AS check_name,
    CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS violations
  FROM orders
  UNION ALL
  SELECT 'in_range(o_totalprice,0,1000000)',
    CAST(COUNT(CASE WHEN o_totalprice IS NULL
                      OR o_totalprice < 0
                      OR o_totalprice > 1000000 THEN 1 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'accepted_values(o_orderstatus)',
    CAST(COUNT(CASE WHEN o_orderstatus IS NULL
                      OR o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'satisfies(order_in_decade)',
    CAST(COUNT(CASE WHEN NOT COALESCE(
      YEAR(o_orderdate) >= 1992 AND YEAR(o_orderdate) <= 1999, FALSE)
      THEN 1 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'unique(o_orderkey)',
    CAST(COALESCE(SUM(cnt), 0) AS BIGINT)
  FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'foreign_key(o_custkey)',
    CAST(COUNT(*) AS BIGINT)
  FROM orders
  WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
)
ORDER BY check_name
"""


register_local(
    QuerySpec(
        "qc_constraint_suite",
        qc_constraint_suite,
        QC_CONSTRAINT_SUITE_SQL,
        ("Q4",),
        doc="Deequ-style constraint suite as oracle-graded (constraint, violations) rows",
    )
)
