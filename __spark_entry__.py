"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's full query registry; see
``walmart_retail_pyspark_sqlite_pipeline_spark/plans/registry.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from walmart_retail_pyspark_sqlite_pipeline_spark.plans import (  # noqa: E402
    oracle_sql_map,
    queries_map,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (fact⨝dim → grouped agg → desc top-k) on sf0.001."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.parity import (
        q02_top_customers,
    )

    return q02_top_customers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
