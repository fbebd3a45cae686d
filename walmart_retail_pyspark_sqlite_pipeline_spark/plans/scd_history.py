"""Oracle-graded SCD Type-2 history maintenance.

Drives `operators/scd.py` (SURVEY tag SCD1) through the value-exact gate:
initialize a customer dimension history at one snapshot date, apply a
second snapshot in which a deterministic subset of customers changed
segment, and emit the full version table. DuckDB's twin constructs the
expected history directly from the same change rule — closed old
versions for changed keys, open new versions, untouched rows still open —
so every dated version row is value-compared, not just counted.

Dates are exported as DATE (both engines agree on the calendar day for
midnight-anchored literals created and read in one session, regardless
of the session timezone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import scd2_apply, scd2_init
from ..sources import read_table
from .registry import QuerySpec, register

_T0 = "2024-01-01"
_T1 = "2024-06-01"
_MOD = 10  # customers with c_custkey % 10 == 0 change segment at T1


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    history = scd2_init(customer, ["c_custkey"], ["c_mktsegment"], _T0)
    snapshot2 = customer.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % _MOD == 0, F.lit("RELOCATED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    hist2 = scd2_apply(history, snapshot2, ["c_custkey"], ["c_mktsegment"], _T1)
    return hist2.select(
        "c_custkey",
        "c_mktsegment",
        F.col("effective_from").cast("date").alias("valid_from"),
        F.col("effective_to").cast("date").alias("valid_to"),
        "is_current",
    ).orderBy("c_custkey", "valid_from")


SCD2_HISTORY_SQL = f"""
SELECT * FROM (
  -- changed keys: old version closed at T1
  SELECT c_custkey, c_mktsegment,
    DATE '{_T0}' AS valid_from, DATE '{_T1}' AS valid_to, FALSE AS is_current
  FROM customer WHERE c_custkey % {_MOD} = 0
  UNION ALL
  -- changed keys: new open version
  SELECT c_custkey, 'RELOCATED',
    DATE '{_T1}', NULL, TRUE
  FROM customer WHERE c_custkey % {_MOD} = 0
  UNION ALL
  -- unchanged keys: original version still open
  SELECT c_custkey, c_mktsegment,
    DATE '{_T0}', NULL, TRUE
  FROM customer WHERE c_custkey % {_MOD} <> 0
)
ORDER BY c_custkey, valid_from
"""


# round-3 rotation: driver-graded.
register(
    QuerySpec(
        "scd2_customer_history",
        scd2_customer_history,
        SCD2_HISTORY_SQL,
        ("SCD1",),
        doc="SCD Type-2 close-and-insert version table, value-compared per dated row",
    )
)
