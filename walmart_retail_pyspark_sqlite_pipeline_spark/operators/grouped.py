"""Grouped-map operators via ``applyInPandas`` (one pandas DataFrame per
group, Arrow both ways).

Use when per-group logic genuinely needs pandas/NumPy semantics (model
scoring per key, complex reindexing). For anything expressible as window
functions, prefer those — they stay JVM-side. The z-score below exists in
both forms precisely so tests can pin them equal.

Scale: one shuffle on the group key; each group must fit in one executor's
memory (that's the applyInPandas contract — groups here are per-user event
sets, naturally small).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ZSCORE_SCHEMA = "user_id long, event_id long, value double, zscore double"


def zscore_apply_in_pandas(events: DataFrame) -> DataFrame:
    """Per-user z-score of ``value`` via grouped-map pandas."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        mean = pdf["value"].mean()
        z = (pdf["value"] - mean) / std if std and std > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "zscore": z,
            }
        )

    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(per_user, schema=ZSCORE_SCHEMA)
    )


def zscore_window(events: DataFrame) -> DataFrame:
    """Same z-score as pure window expressions (the JVM-side preferred
    form)."""
    w = Window.partitionBy("user_id")
    mean = F.avg("value").over(w)
    std = F.stddev_samp("value").over(w)
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.when(std > 0, (F.col("value") - mean) / std)
        .otherwise(F.lit(0.0))
        .alias("zscore"),
    )
