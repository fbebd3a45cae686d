"""Projection operators: rename maps and schema enforcement.

Reference parity (semantics only — implementation is fresh):
- rename-projection with null-padding: reference
  /root/reference/src/transform_spark.py:38-45 (SURVEY §2.2 P1). One single
  ``select`` — never chained ``withColumnRenamed``, which builds N nested
  projections Catalyst then has to collapse.
- schema enforcement by cast: reference /root/reference/src/quality_checks.py:46-64
  (SURVEY §2.2 P2, §2.12 Q1). Also one projection. Casts use ``try_cast``
  so lenient behavior (``"NA"`` → NULL, SURVEY §1.2) holds regardless of the
  session's ANSI setting — the reference relied on Spark 3's non-ANSI
  default; under Spark 4 that default flipped, so parity must be explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename per ``{old: new}`` in one projection.

    Missing source columns become typed-null strings (the reference's
    null-padding behavior); columns not in the mapping are DROPPED.
    """
    cols = [
        (F.col(old) if old in df.columns else F.lit(None).cast("string")).alias(new)
        for old, new in mapping.items()
    ]
    return df.select(*cols)


def enforce_schema(
    df: DataFrame, expected: dict[str, str]
) -> tuple[DataFrame, list[str]]:
    """Cast columns to ``{name: sql_type}``, add missing ones as typed
    nulls, drop + report extras, and reorder to the expected order — all in
    ONE projection.

    Returns ``(typed_df, extra_columns)``.
    """
    extras = [c for c in df.columns if c not in expected]
    cols = [
        (
            F.col(name).try_cast(sql_type)
            if name in df.columns
            else F.lit(None).cast(sql_type)
        ).alias(name)
        for name, sql_type in expected.items()
    ]
    return df.select(*cols), extras
